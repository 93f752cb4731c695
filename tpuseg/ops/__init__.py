from tpuseg.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear,
)

__all__ = ["resize_bilinear", "resize_nearest", "upsample2x_bilinear"]
