from .misc import (
    append_cluster,
    get_task_error,
    get_pixel_error,
    make_new_directory,
    normalize_hwl,
    average,
)
from .kitti import (
    get_calibration,
    get_translation,
    get_simplified_calibration,
    check_conditions,
    get_difficulty,
    split_training,
    factory_basename,
    read_and_rewrite,
    find_cluster,
    strip_to_devkit_columns,
)
from .logs import set_logger
from .compile_cache import enable_compilation_cache
from .backend import probe_devices, require_live_backend
from .nuscenes import select_categories

# Geometry lives in monoloco_tpu.geometry (the jit/device layer); re-export it
# here so imports written against the reference's `monoloco.utils` port 1:1.
from ..geometry import (
    get_iou_matches, reorder_matches, get_iou_matrix, get_iou_matches_matrix,
    get_category, open_annotations,
    xyz_from_distance, get_keypoints, pixel_to_camera, project_3d, open_image,
    correct_angle, to_spherical, to_cartesian, back_correct_angles,
    mask_joint_disparity, average_locations, extract_stereo_matches,
    verify_stereo, disparity_to_depth, transform_kp,
)
