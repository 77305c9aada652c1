from rtf_tpu.core.math import (  # noqa: F401
    dot, cross, normalize, length, length_sq, reflect, luma, BIGFLOAT,
)
from rtf_tpu.core.halton import halton, halton_np  # noqa: F401
from rtf_tpu.core.transform import Transform  # noqa: F401
