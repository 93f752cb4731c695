from tpuseg.export.quantize import (
    dequantize_int8,
    fold_batchnorm,
    quantize_int8,
)
from tpuseg.export.int8_full import calibrate, quantized_apply_fn
from tpuseg.export.onnx_export import export_onnx
from tpuseg.export.stablehlo import export_model, load_exported

__all__ = [
    "export_onnx",
    "fold_batchnorm",
    "quantize_int8",
    "dequantize_int8",
    "export_model",
    "load_exported",
    "calibrate",
    "quantized_apply_fn",
]
