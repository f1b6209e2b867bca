from .printer import Printer, draw_orientation, social_distance_colors
from .pifpaf_show import KeypointPainter, image_canvas, get_pifpaf_outputs
from .figures import show_results, show_spread, show_task_error, show_box_plot
