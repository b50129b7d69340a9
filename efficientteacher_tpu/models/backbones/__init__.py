"""Backbone factory (reference models/backbone/__init__.py:8-23)."""

from .yolov5 import YoloV5BackBone

_REGISTRY = {
    "YoloV5": YoloV5BackBone,
}


def register_backbone(name, cls):
    _REGISTRY[name] = cls


def build_backbone_cls(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise NotImplementedError(
            f"backbone {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
