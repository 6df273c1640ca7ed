from .colors import get_n_colors
from .misc import touch_dir

__all__ = ["get_n_colors", "touch_dir"]
