from . import aws, azure, gcp, lookup  # noqa: F401
