"""Resumption-token codec (SURVEY §2.5 O1/O2).

The reference's token carries cursor + completeListSize and becomes empty on
the final page (/root/reference/CHANGELOG.md:69-73, 108-110;
templates/agg_list_records.xml:10-21). Ours additionally pins the snapshot
timestamp and a hash of the list-query parameters, so a token replayed
against a drifted query (different set/from/until/prefix) is rejected as
badResumptionToken instead of silently paging a different list.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import json
from dataclasses import dataclass


class BadResumptionToken(ValueError):
    """OAI badResumptionToken error condition."""


@dataclass(frozen=True)
class ResumptionToken:
    """OAI resumptionToken is an EXCLUSIVE argument: a resumed request
    carries verb + token only, so the token itself holds the full query
    state (prefix/set/from/until) plus the paging cursor."""

    query_hash: str          # integrity hash of (prefix, set, from, until)
    cursor: int              # rows already delivered
    complete_list_size: int  # count() at token birth (A1)
    snapshot_ts: str         # P7/O2 bound fixed for the token lifetime
    metadata_prefix: str
    set_spec: str | None = None
    from_ts: str | None = None
    until_ts: str | None = None
    last_key: str | None = None  # keyset-pagination watermark (scale path):
                                 # next page = WHERE key > last_key, a pushed-down
                                 # range scan instead of a global window
    vt_version: int | None = None  # versioned-table snapshot pinned at token
                                   # birth (the 'VERSION AS OF' idiom): resumed
                                   # pages time-travel to THIS version, so a
                                   # concurrent merge between pages cannot
                                   # shear the walk

    def encode(self) -> str:
        payload = json.dumps(
            {"q": self.query_hash, "c": self.cursor, "n": self.complete_list_size,
             "t": self.snapshot_ts, "p": self.metadata_prefix, "s": self.set_spec,
             "f": self.from_ts, "u": self.until_ts, "k": self.last_key,
             "v": self.vt_version},
            separators=(",", ":"), sort_keys=True,
        )
        return base64.urlsafe_b64encode(payload.encode()).decode()

    @classmethod
    def decode(cls, token: str) -> "ResumptionToken":
        try:
            payload = json.loads(base64.urlsafe_b64decode(token.encode()))
            vt_v = payload.get("v")
            tok = cls(query_hash=payload["q"], cursor=int(payload["c"]),
                      complete_list_size=int(payload["n"]), snapshot_ts=payload["t"],
                      metadata_prefix=payload["p"], set_spec=payload.get("s"),
                      from_ts=payload.get("f"), until_ts=payload.get("u"),
                      last_key=payload.get("k"),
                      vt_version=int(vt_v) if vt_v is not None else None)
        except (binascii.Error, json.JSONDecodeError, KeyError, ValueError, TypeError) as exc:
            raise BadResumptionToken(f"cannot decode token: {token!r}") from exc
        if tok.query_hash != query_hash(tok.metadata_prefix, tok.set_spec,
                                        tok.from_ts, tok.until_ts):
            raise BadResumptionToken("token integrity check failed")
        return tok


def query_hash(metadata_prefix: str, set_spec: str | None,
               from_ts: str | None, until_ts: str | None) -> str:
    key = json.dumps([metadata_prefix, set_spec, from_ts, until_ts])
    return hashlib.sha256(key.encode()).hexdigest()[:16]
