from . import irreps  # noqa: F401
