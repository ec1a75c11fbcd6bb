"""Property-based tests (hypothesis) for the resumption-token codec —
the reference pins token behavior with hand-picked cases
(/root/reference/tests/test_serve.py resumption sections); these pin the
same contract over the whole input space: encode/decode is a lossless
round-trip, and any tampering or garbage is BadResumptionToken, never a
crash or a silently different query."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.tokens import (
    BadResumptionToken, ResumptionToken, query_hash,
)

_text = st.text(min_size=0, max_size=40)
_opt_text = st.none() | _text


def _tokens():
    return st.builds(
        lambda p, s, f, u, c, n, t, k: ResumptionToken(
            query_hash=query_hash(p, s, f, u), cursor=c, complete_list_size=n,
            snapshot_ts=t, metadata_prefix=p, set_spec=s, from_ts=f,
            until_ts=u, last_key=k),
        _text, _opt_text, _opt_text, _opt_text,
        st.integers(min_value=0, max_value=10**12),
        st.integers(min_value=-1, max_value=10**12),
        _text, _opt_text,
    )


@settings(max_examples=300, deadline=None)
@given(_tokens())
def test_round_trip_lossless(tok):
    assert ResumptionToken.decode(tok.encode()) == tok


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_garbage_never_crashes(garbage):
    try:
        decoded = ResumptionToken.decode(garbage)
    except BadResumptionToken:
        return
    # the astronomically unlikely valid decode must still be self-consistent
    assert decoded.query_hash == query_hash(
        decoded.metadata_prefix, decoded.set_spec,
        decoded.from_ts, decoded.until_ts)


@settings(max_examples=200, deadline=None)
@given(_tokens(), _text)
def test_tampered_query_params_rejected(tok, other_prefix):
    """Replaying a token against a different query must fail the integrity
    hash — the codec, not the caller, enforces the exclusive-argument rule."""
    if other_prefix == tok.metadata_prefix:
        return
    import dataclasses
    forged = dataclasses.replace(tok, metadata_prefix=other_prefix)
    with pytest.raises(BadResumptionToken):
        ResumptionToken.decode(forged.encode())


@settings(max_examples=200, deadline=None)
@given(_tokens())
def test_query_hash_distinguishes_none_from_empty(tok):
    """None and '' set_spec are DIFFERENT queries (set omitted vs set='');
    the hash must not conflate them, or a token could silently widen the
    list it pages."""
    h_none = query_hash(tok.metadata_prefix, None, tok.from_ts, tok.until_ts)
    h_empty = query_hash(tok.metadata_prefix, "", tok.from_ts, tok.until_ts)
    assert h_none != h_empty
