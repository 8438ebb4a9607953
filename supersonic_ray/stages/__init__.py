from . import aggregates, joins, multimodal, ops, skew, stateful, text, vectors  # noqa: F401
