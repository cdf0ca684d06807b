from .flagship import parse_enrich, run_flagship  # noqa: F401
