from . import sqlite  # noqa: F401
