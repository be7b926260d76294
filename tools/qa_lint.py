"""Minimal first-party lint: syntax + unused-import check.

Fallback for images without ruff/mypy so `make qa` always executes a real
check (the reference's CI guarantee is ruff+mypy,
/root/reference/.github/workflows/ci.yml:28-30 — this is the reduced but
non-vacuous equivalent). AST-based, stdlib-only.

Checks per file:
  - the file parses (syntax errors are hard failures)
  - every `import x` / `from m import x` name is referenced somewhere in
    the module (attribute loads, decorators, strings in __all__ count);
    `__init__.py` files are exempt (re-export aggregators), as are
    imports marked `# noqa` on their line.

Usage: python tools/qa_lint.py DIR [DIR ...]
"""

from __future__ import annotations

import ast
import pathlib
import sys


def _imported_names(tree: ast.AST, noqa_lines: set[int]):
    """Yield (name, lineno) for each binding introduced by an import."""
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if node.lineno in noqa_lines:
                    continue
                name = alias.asname or alias.name.split(".")[0]
                yield name, node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if node.lineno in noqa_lines or alias.name == "*":
                    continue
                name = alias.asname or alias.name
                yield name, node.lineno


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # x.y.z — the root Name is already collected above.
            pass
        elif isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)  # __all__ entries, forward-ref annotations
    return used


def lint_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]
    if path.name == "__init__.py":
        return []
    noqa = {
        i + 1
        for i, line in enumerate(src.splitlines())
        if "# noqa" in line
    }
    used = _used_names(tree)
    errors = []
    for name, lineno in _imported_names(tree, noqa):
        if name not in used:
            errors.append(f"{path}:{lineno}: unused import '{name}'")
    return errors


def main(argv: list[str]) -> int:
    roots = [pathlib.Path(a) for a in argv] or [pathlib.Path(".")]
    files = []
    for root in roots:
        files.extend(sorted(root.rglob("*.py")) if root.is_dir() else [root])
    errors = []
    for f in files:
        errors.extend(lint_file(f))
    for e in errors:
        print(e)
    print(f"qa_lint: {len(files)} files checked, {len(errors)} problems")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
