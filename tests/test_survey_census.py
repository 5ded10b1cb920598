"""SURVEY.md's query census must match the live registry (r10 verdict
#10: hand-written counts drifted; the block is generated, and this
test fails the suite if a registry change lands without a regen)."""

from __future__ import annotations

import os

from tools.gen_survey_census import BEGIN, END, census_block

SURVEY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md"
)


def test_survey_census_matches_registry():
    text = open(SURVEY).read()
    assert BEGIN in text and END in text, (
        "SURVEY.md lacks the census block — run "
        "tools/gen_survey_census.py"
    )
    committed = text[text.index(BEGIN): text.index(END) + len(END)]
    assert committed == census_block(), (
        "SURVEY.md census is stale — rerun tools/gen_survey_census.py"
    )
