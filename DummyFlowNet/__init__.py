from .of import OpticalFlow  # noqa: F401
