"""Metadata-format registry (SURVEY §2.9).

The reference discovers formats through the ``cdcagg.oai.metadataformats``
entry-point group at startup (/root/reference/setup.py:41-45,
cdcagg_oai/__init__.py:17-25, loaded by kuha's ``load_metadataformats`` at
cdcagg_oai/serve.py:98). The Spark-side equivalent of a "format" is a
projection list + a renderer + namespace identifiers; this registry makes
that a first-class, extensible object so a new format plugs in without
touching the planner or facade — either programmatically via ``register``
or, matching the reference's packaging contract, by shipping a package
that declares a ``cdcagg.oai.metadataformats`` entry point
(``discover_entry_points`` scans the group at import time).
"""

from __future__ import annotations

import warnings
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class MetadataFormat:
    prefix: str
    namespace: str
    schema_url: str
    fields: list[str]                      # projection (P1) incl. header fields
    renderer: Callable                     # (parent_el, row, derived) -> None
    needs_derived: bool = False            # attach F1/F2/F3/F6 columns pre-collect
    validity_filter_name: str | None = None  # e.g. 'openaire' for datacite (P4)


_REGISTRY: dict[str, MetadataFormat] = {}


def register(fmt: MetadataFormat) -> None:
    _REGISTRY[fmt.prefix] = fmt


def unregister(prefix: str) -> None:
    _REGISTRY.pop(prefix, None)


def get(prefix: str) -> MetadataFormat | None:
    return _REGISTRY.get(prefix)


def prefixes() -> tuple[str, ...]:
    return tuple(_REGISTRY)


def _register_builtins() -> None:
    from ..plans.query_builder import FORMAT_FIELDS
    from . import render as R

    register(MetadataFormat(
        prefix="oai_dc",
        namespace="http://www.openarchives.org/OAI/2.0/oai_dc/",
        schema_url="http://www.openarchives.org/OAI/2.0/oai_dc.xsd",
        fields=FORMAT_FIELDS["oai_dc"],
        renderer=lambda parent, row, derived: R.render_oai_dc(parent, row),
    ))
    register(MetadataFormat(
        prefix="oai_ddi25",
        namespace="ddi:codebook:2_5",
        schema_url="https://ddialliance.org/Specification/DDI-Codebook/2.5/XMLSchema/codebook.xsd",
        fields=FORMAT_FIELDS["oai_ddi25"],
        renderer=lambda parent, row, derived: R.render_oai_ddi25(parent, row),
    ))
    register(MetadataFormat(
        prefix="oai_datacite",
        namespace="http://datacite.org/schema/kernel-3",
        schema_url="http://schema.datacite.org/meta/kernel-3/metadata.xsd",
        fields=FORMAT_FIELDS["oai_datacite"],
        renderer=R.render_oai_datacite,
        needs_derived=True,
        validity_filter_name="openaire",
    ))


ENTRY_POINT_GROUP = "cdcagg.oai.metadataformats"


def discover_entry_points(group: str = ENTRY_POINT_GROUP) -> list[str]:
    """Scan the installed-package metadata for format plugins, mirroring
    the reference's startup discovery. Each entry point may resolve to a
    ``MetadataFormat``, a zero-arg factory returning one, or a list of
    either. A broken plugin is skipped with a warning — a third-party
    package must not take the server down. Returns registered prefixes."""
    from importlib import metadata as im

    try:
        eps = im.entry_points(group=group)
    except TypeError:  # Python < 3.10 signature
        eps = im.entry_points().get(group, [])  # pragma: no cover
    loaded: list[str] = []
    for ep in eps:
        try:
            obj = ep.load()
            if not isinstance(obj, (MetadataFormat, list, tuple)) and callable(obj):
                obj = obj()
            fmts = obj if isinstance(obj, (list, tuple)) else [obj]
            for fmt in fmts:
                if not isinstance(fmt, MetadataFormat):
                    raise TypeError(f"{ep.value} yielded {type(fmt).__name__}, "
                                    "expected MetadataFormat")
                register(fmt)
                loaded.append(fmt.prefix)
        except Exception as exc:  # noqa: BLE001 — isolate plugin faults
            warnings.warn(f"metadata-format entry point {ep.name!r} failed: {exc}",
                          stacklevel=2)
    return loaded


_register_builtins()
# entry-point discovery is NOT run at import time: importing the library
# must never execute third-party plugin code. The serving entry point
# (serve.py) calls discover_entry_points() at startup, mirroring the
# reference's load_metadataformats in cdcagg_oai/serve.py:98; embedders
# call it themselves when they want plugins.
