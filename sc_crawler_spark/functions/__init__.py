from . import hashing, scalars, text, vectors  # noqa: F401
