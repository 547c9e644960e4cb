from .math import (qvec2rotmat, rotmat2qvec, get_view_matrix,
                   get_project_matrix, viewproj_to_frustumplane,
                   frustum_culling_aabb, img_to_tiles, tiles_to_img)
from . import sh

__all__ = ["qvec2rotmat", "rotmat2qvec", "get_view_matrix",
           "get_project_matrix", "viewproj_to_frustumplane",
           "frustum_culling_aabb", "img_to_tiles", "tiles_to_img", "sh"]
