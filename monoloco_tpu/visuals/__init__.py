from .printer import Printer, draw_orientation, social_distance_colors
from .pifpaf_show import KeypointPainter, image_canvas, get_pifpaf_outputs
