from videovanish_tpu.models.diffueraser.model import DiffuEraser

__all__ = ["DiffuEraser"]
