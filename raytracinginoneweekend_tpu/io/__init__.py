from .image import write_png, write_ppm  # noqa: F401
