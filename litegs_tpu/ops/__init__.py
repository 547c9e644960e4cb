from . import projection, binning, raster_jnp, losses

__all__ = ["projection", "binning", "raster_jnp", "losses"]
