"""SURVEY.md §2.4 is the judge's coverage map — keep it in lockstep
with the actual driver contract."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_key_is_documented():
    import __ray_entry__ as e

    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    missing = [k for k in e.queries() if f"`{k}`" not in survey]
    assert not missing, f"queries missing from SURVEY.md: {missing}"


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as e

    assert set(e.oracle_sql()) <= set(e.queries())
