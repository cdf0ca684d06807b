from .reference_semantics import (  # noqa: F401
    ERROR_VARIANTS,
    FACILITY_NAMES,
    SEVERITY_NAMES,
    ParseError,
    parse_line,
)
from .canonical_json import message_to_json, sd_to_json  # noqa: F401
