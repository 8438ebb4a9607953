from . import aggregates, joins, multimodal, ops, skew, stateful, text, vectors, windows  # noqa: F401
