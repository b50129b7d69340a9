from . import callbacks, checkpoint, general, reparam, torch_import

__all__ = ["callbacks", "checkpoint", "general", "reparam", "torch_import"]
