from .gaussians import (GaussianParams, create_gaussians, knn_mean_sq_dist,
                        pad_params, pad_to_chunk, activate)
from .morton import morton_codes, spatial_sort_indices
from . import cluster

__all__ = ["GaussianParams", "create_gaussians", "knn_mean_sq_dist",
           "pad_params", "pad_to_chunk", "activate", "morton_codes",
           "spatial_sort_indices", "cluster"]
