from . import aggregate, joins, setops, windows  # noqa: F401
