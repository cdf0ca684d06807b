from .corpus import MUST_PARSE, MUST_REJECT, corpus_lines  # noqa: F401
from .transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    synth_transcripts,
    write_transcripts,
    transcripts_from_events,
)
