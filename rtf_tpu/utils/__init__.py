from rtf_tpu.utils.png import read_png, write_png  # noqa: F401
from rtf_tpu.utils.image import rmse  # noqa: F401
