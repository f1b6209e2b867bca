from .camera import (
    pixel_to_camera,
    project_points,
    project_3d,
    get_keypoints,
    xyz_from_distance,
    correct_angle,
    back_correct_angles,
    to_spherical,
    to_cartesian,
    transform_kp,
    open_image,
)
from .iou import (
    iou_matrix,
    get_iou_matrix,
    calculate_iou,
    get_iou_matches,
    get_iou_matches_matrix,
    reorder_matches,
    get_category,
    open_annotations,
)
from .stereo import (
    BF,
    depth_to_pixel_error,
    disparity_to_depth,
    interquartile_mask,
    mask_joint_disparity,
    average_locations,
    extract_stereo_matches,
    verify_stereo,
)
