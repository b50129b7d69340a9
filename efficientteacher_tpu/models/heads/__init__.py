"""Head factory (reference models/head/__init__.py:12-27).

`head_model_type` mirrors the detector's model_type dispatch
(reference yolo.py:66-82: anchor heads -> 'yolov5', anchor-free -> 'yolox',
TAL heads under SSOD -> 'tal')."""

from .yolov5 import YoloV5Detect
from .yolov6 import YoloV6Detect
from .yolov7 import YoloV7Detect
from .yolov8 import YoloV8Detect
from .yolox import YoloXDetect

_REGISTRY = {
    "YoloV5": YoloV5Detect,
    "YoloV6": YoloV6Detect,
    "YoloV7": YoloV7Detect,
    "YoloV8": YoloV8Detect,
    "YoloX": YoloXDetect,
}

_MODEL_TYPE = {
    "YoloV5": "yolov5",
    "YoloV7": "yolov5",   # IDetect is anchor-based like Detect
    "YoloX": "yolox",
    "YoloV6": "tal",
    "YoloV8": "tal",
}


def register_head(name, cls, model_type: str):
    _REGISTRY[name] = cls
    _MODEL_TYPE[name] = model_type


def build_head_cls(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise NotImplementedError(
            f"head {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def head_model_type(name: str) -> str:
    return _MODEL_TYPE.get(name, "yolov5")
