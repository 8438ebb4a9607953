from . import aggregates, joins, multimodal, ops, stateful, text, vectors  # noqa: F401
