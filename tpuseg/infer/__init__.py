from tpuseg.infer.predictor import Predictor
from tpuseg.infer.postprocess import overlay_predictions
from tpuseg.infer.video import VideoPipeline

__all__ = ["Predictor", "overlay_predictions", "VideoPipeline"]
