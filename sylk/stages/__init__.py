from .parse import PARSE_FIELDS, parse_batch  # noqa: F401
from .enrich import Enricher  # noqa: F401
