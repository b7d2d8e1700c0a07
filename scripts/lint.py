#!/usr/bin/env python3
"""Self-contained lint pass (no third-party deps).

Reference counterpart: the reference's lint stack (clang-tidy, cppcheck,
pre-commit — /root/reference/scripts/run-clang-tidy.sh,
.pre-commit-config.yaml). This environment ships no ruff/flake8/mypy and
forbids installs, so CI runs this AST-based checker everywhere and the
richer ruff/mypy configs in pyproject.toml apply wherever those tools
exist (.pre-commit-config.yaml wires both).

Checks: syntax, unused imports, duplicate imports, `except:` bare
clauses, mutable default arguments, trailing whitespace, and tabs in
indentation.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TARGETS = ["starpu_inference_server_tpu", "scripts", "tests", "bench.py",
           "__graft_entry__.py"]
# names imported for re-export or side effects
ALLOW_UNUSED = {"annotations", "_pb", "kserve_v2_pb2"}


def iter_files():
    for t in TARGETS:
        p = REPO / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


class ImportChecker(ast.NodeVisitor):
    def __init__(self):
        self.imported = {}   # name -> lineno
        self.used = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported.setdefault(name, node.lineno)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imported.setdefault(a.asname or a.name, node.lineno)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path: Path):
    issues = []
    rel = path.relative_to(REPO)
    src = path.read_text()
    lines = src.splitlines()

    def noqa(lineno: int) -> bool:
        return "# noqa" in lines[lineno - 1] if lineno <= len(lines) else False
    try:
        tree = ast.parse(src, filename=str(rel))
    except SyntaxError as exc:
        return [f"{rel}:{exc.lineno}: syntax error: {exc.msg}"]

    # unused imports (module scope only — conservative, zero false
    # positives from local shadowing)
    chk = ImportChecker()
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            chk.visit(node)
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            chk.used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass
    # names used in __all__ strings count as used
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "__all__"
                for t in node.targets
            )
            and isinstance(node.value, (ast.List, ast.Tuple))
        ):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    chk.used.add(elt.value)
    for name, lineno in sorted(chk.imported.items(), key=lambda kv: kv[1]):
        if name not in chk.used and name not in ALLOW_UNUSED and not noqa(lineno):
            issues.append(f"{rel}:{lineno}: unused import {name!r}")

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            issues.append(f"{rel}:{node.lineno}: bare 'except:' clause")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    issues.append(
                        f"{rel}:{d.lineno}: mutable default argument in "
                        f"{node.name}()"
                    )

    for i, line in enumerate(src.splitlines(), 1):
        if line.rstrip("\n") != line.rstrip():
            issues.append(f"{rel}:{i}: trailing whitespace")
        stripped = line.lstrip(" ")
        if stripped.startswith("\t"):
            issues.append(f"{rel}:{i}: tab indentation")
    return issues


def main() -> int:
    all_issues = []
    n = 0
    for path in iter_files():
        n += 1
        all_issues.extend(check_file(path))
    for issue in all_issues:
        print(issue)
    print(f"[lint] {n} files, {len(all_issues)} issues", file=sys.stderr)
    return 1 if all_issues else 0


if __name__ == "__main__":
    raise SystemExit(main())
