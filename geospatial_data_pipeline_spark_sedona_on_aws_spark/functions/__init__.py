from .spatial import register_spatial_functions  # noqa: F401
from .text import register_text_functions  # noqa: F401
