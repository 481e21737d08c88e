"""Dependency-free lint gate: syntax + unused-import check over the package.

The reference pins fmt+clippy in CI (/root/reference/.github/workflows/
ci.yml:13-22); this environment has no ruff/flake8, so the equivalent gate
is stdlib-ast based. Exit code 1 on any finding.

Usage: python scripts/lint.py [paths...]
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


def _imported_names(node: ast.AST):
    if isinstance(node, ast.Import):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            yield name, node.lineno
    elif isinstance(node, ast.ImportFrom):
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            yield (alias.asname or alias.name), node.lineno


def check_file(path: Path) -> list[str]:
    try:
        tree = ast.parse(path.read_text(), filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]

    problems: list[str] = []
    imports: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for name, lineno in _imported_names(node):
                imports.setdefault(name, lineno)

    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    # Names re-exported via __all__ strings count as used.
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            targets = [
                t.id for t in node.targets if isinstance(t, ast.Name)
            ]
            if "__all__" in targets and isinstance(
                node.value, (ast.List, ast.Tuple)
            ):
                for elt in node.value.elts:
                    if isinstance(elt, ast.Constant) and isinstance(
                        elt.value, str
                    ):
                        used.add(elt.value)

    is_facade = path.name == "__init__.py"
    for name, lineno in imports.items():
        if name.startswith("_"):
            continue
        if name not in used and not is_facade:
            problems.append(f"{path}:{lineno}: unused import '{name}'")
    return problems


def main(argv: list[str]) -> int:
    roots = [Path(p) for p in argv] or [
        Path("pqvector_tpu"),
        Path("bench.py"),
        Path("__graft_entry__.py"),
    ]
    files: list[Path] = []
    for root in roots:
        if root.is_dir():
            files.extend(sorted(root.rglob("*.py")))
        elif root.suffix == ".py":
            files.append(root)
    problems: list[str] = []
    for f in files:
        problems.extend(check_file(f))
    for p in problems:
        print(p)
    print(f"lint: {len(files)} files, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
