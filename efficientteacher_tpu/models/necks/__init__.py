"""Neck factory (reference models/neck/__init__.py:23-39)."""

from .yolov5 import YoloV5Neck

_REGISTRY = {
    "YoloV5": YoloV5Neck,
}


def register_neck(name, cls):
    _REGISTRY[name] = cls


def build_neck_cls(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise NotImplementedError(
            f"neck {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
