from . import dedup, scores, similarity, sync, upsert, windows  # noqa: F401
