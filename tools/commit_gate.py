#!/usr/bin/env python
"""Pre-commit gate (round-4 post-mortem: an unexecuted refactor with a dead
helper and a tuple-arity bug was committed blind and zeroed the round).

No third-party linters are installed in this container, so this is a
stdlib-only gate:

1. byte-compile every ``*.py`` under the package, tests/, tools/ and the
   repo root (syntax errors),
2. AST sweep for module-private functions/classes (``_name``) that are
   never referenced anywhere in their own module — the exact shape of the
   dead ``_headers`` helper that hid the r4 crash,
3. import ``__spark_entry__`` and assert the 50/50 queries()/oracle_sql()
   contract (the driver's smoke surface).

Exit code 0 = safe to commit. Run: ``python tools/commit_gate.py``.
"""

from __future__ import annotations

import ast
import pathlib
import py_compile
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = "cessda_cdc_aggregator_oai_pmh_repo_handler_spark"

# Private symbols that are intentionally defined-but-unreferenced in their
# module (exported for tests, monkeypatch seams, or cache cells reset by
# tests). Keep this list SHORT and justified.
ALLOWED_UNUSED: set[tuple[str, str]] = set()


def iter_sources():
    for sub in (PKG, "tests", "tools"):
        yield from sorted((REPO / sub).rglob("*.py"))
    yield REPO / "__spark_entry__.py"
    yield REPO / "bench.py"


def check_syntax(paths) -> list[str]:
    errs = []
    for p in paths:
        try:
            py_compile.compile(str(p), doraise=True)
        except py_compile.PyCompileError as e:
            errs.append(f"SYNTAX {p}: {e.msg}")
    return errs


class _NameCollector(ast.NodeVisitor):
    """Collect every Name/Attribute identifier referenced in a module."""

    def __init__(self):
        self.used: set[str] = set()

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.used.add(node.attr)
        self.generic_visit(node)


def check_dead_private(paths) -> list[str]:
    errs = []
    for p in paths:
        if "tests" in p.parts:
            continue  # pytest fixtures/params are referenced by framework
        tree = ast.parse(p.read_text(), filename=str(p))
        defined: dict[str, int] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                name = node.name
                if name.startswith("_") and not name.startswith("__"):
                    defined[name] = node.lineno
        if not defined:
            continue
        collector = _NameCollector()
        # Count references everywhere EXCEPT the def statement's own name.
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                collector.used.add(node.id)
            elif isinstance(node, ast.Attribute):
                collector.used.add(node.attr)
        text = p.read_text()
        for name, lineno in defined.items():
            if (str(p.name), name) in ALLOWED_UNUSED:
                continue
            # A def'd name referenced only once in source text = only its
            # own def line -> dead. (String-level count is the cheap,
            # zero-false-negative proxy; decorated/re-exported names
            # appear >= twice.)
            if text.count(name) <= 1:
                errs.append(f"DEAD {p}:{lineno}: private symbol "
                            f"'{name}' is never referenced")
    return errs


def check_entry_contract() -> list[str]:
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __spark_entry__ as m\n"
        "q = m.queries(); o = m.oracle_sql()\n"
        "assert len(q) == 50, f'queries: {len(q)}'\n"
        "assert len(o) == 50, f'oracles: {len(o)}'\n"
        "assert set(o) == set(q)\n"
        "print('entry-contract-ok')\n" % str(REPO)
    )
    res = subprocess.run([sys.executable, "-c", script], cwd=str(REPO),
                         capture_output=True, text=True, timeout=300)
    if res.returncode != 0 or "entry-contract-ok" not in res.stdout:
        return [f"ENTRY __spark_entry__ contract failed:\n{res.stderr}"]
    return []


def main() -> int:
    paths = [p for p in iter_sources() if p.exists()]
    errs = check_syntax(paths)
    errs += check_dead_private(paths)
    errs += check_entry_contract()
    for e in errs:
        print(e)
    print(f"commit_gate: {len(paths)} files, {len(errs)} problems")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
