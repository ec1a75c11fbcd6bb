"""The driver-gate value hash, shared by verify_local / soak /
suite_hashes: columns sorted by name, cells normalized, rows sorted,
sha256.

Floats are normalized at FULL precision (``repr``, i.e. shortest
round-trip representation of the exact double) — r7's judge proved the
old 6-significant-digit normalization hid a deterministic 7th-digit
cross-engine divergence for three rounds (sql_text_lateral_alias,
31234.68 vs 31234.69 both collapsing to "31234.7"). The local mirror
must be at least as strict as the driver's hash; full repr is the
strictest possible for doubles.
"""

from __future__ import annotations

import hashlib


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:  # collapse -0.0 / +0.0 (equal doubles, distinct reprs)
            return "0.0"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_cell_lenient(v):
    """The pre-r8 6-significant-digit normalization, kept for diffing:
    a query red under strict but green under lenient is a sub-1e-6
    relative divergence (scalar-rounding class), not a logic bug."""
    import math

    if isinstance(v, float) and not math.isnan(v):
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell_lenient(x) for x in v) + "]"
    return norm_cell(v)


def value_hash(cols, rows, norm=None):
    norm = norm or norm_cell
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()
