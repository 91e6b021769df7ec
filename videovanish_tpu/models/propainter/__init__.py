from videovanish_tpu.models.propainter.model import Propainter

__all__ = ["Propainter"]
