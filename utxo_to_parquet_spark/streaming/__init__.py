from . import windows  # noqa: F401  (registration side effects)
