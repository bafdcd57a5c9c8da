from .config import Config, KeyNotFoundException
from .labels import NO_LABEL, RgbLabelConversion, LayerCoding, parse_color_codings
from .calibration import Calibration

__all__ = [
    "Config",
    "KeyNotFoundException",
    "NO_LABEL",
    "RgbLabelConversion",
    "LayerCoding",
    "parse_color_codings",
    "Calibration",
]
