from . import binning, losses, pose, projection, raster, raster_jnp

__all__ = ["binning", "losses", "pose", "projection", "raster",
           "raster_jnp"]
