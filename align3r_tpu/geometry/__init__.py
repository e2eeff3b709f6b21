from .core import (
    xy_grid,
    geotrf,
    inv,
    depthmap_to_pts3d,
    depthmap_to_camera_coords,
    normalize_pointcloud,
    pixel_to_pointcloud,
    colmap_to_opencv_intrinsics,
    opencv_to_colmap_intrinsics,
)
from .poses import (
    signed_log1p,
    signed_expm1,
    quat_to_rotmat,
    rotmat_to_quat,
    pose_vec_to_matrix,
    matrix_to_pose_vec,
    sim3_vec_to_matrix,
    relative_pose_error,
    rigid_points_registration,
)

__all__ = [k for k in dir() if not k.startswith("_")]
