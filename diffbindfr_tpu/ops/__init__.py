from . import vina

__all__ = ["vina"]
