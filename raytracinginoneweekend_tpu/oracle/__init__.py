from .scalar import render_oracle  # noqa: F401
