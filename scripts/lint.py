"""Self-contained lint gate (no third-party linters in this environment).

The reference enforces flake8 with ``max-line-length = 100``
(`/root/reference/setup.cfg`, `.travis/flake.sh`); this module reimplements
the checks that matter for this codebase with the stdlib only, so the same
discipline runs in network-free CI (`tests/test_lint.py`):

- E501  line longer than 100 characters
- W291  trailing whitespace
- W191  tab characters in indentation
- E722  bare ``except:``
- F401  imported name never used (module ``__all__`` re-exports and
        import-only alias modules are recognized as intentional)
- E999  syntax errors (via ``compile``)

Usage::

    python scripts/lint.py [paths...]     # default: the repo's source roots
"""

from __future__ import annotations

import ast
import os
import sys

MAX_LINE = 100

DEFAULT_ROOTS = ('spotlight_tpu', 'tests', 'scripts', 'examples',
                 'bench.py', '__graft_entry__.py')

# Lines that legitimately exceed the limit (long URLs in docstrings).
_URL_MARKERS = ('http://', 'https://')


def _iter_py_files(paths):
    for path in paths:
        if os.path.isfile(path) and path.endswith('.py'):
            yield path
        elif os.path.isdir(path):
            for dirpath, dirnames, filenames in os.walk(path):
                dirnames[:] = [d for d in dirnames
                               if d not in ('__pycache__', '.git')]
                for name in sorted(filenames):
                    if name.endswith('.py'):
                        yield os.path.join(dirpath, name)


def _collect_imports(tree):
    """Yield (alias_node, bound_name, is_explicit_reexport)."""
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                bound = alias.asname or alias.name.split('.')[0]
                explicit = alias.asname == alias.name
                yield node, alias, bound, explicit
        elif isinstance(node, ast.ImportFrom):
            if node.module == '__future__':
                continue
            for alias in node.names:
                if alias.name == '*':
                    continue
                bound = alias.asname or alias.name
                explicit = alias.asname == alias.name
                yield node, alias, bound, explicit


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # Dotted usage like `os.path` marks `os` used via the Name leaf,
            # which ast.Name already covers; nothing extra needed.
            pass
    return used


def _module_all(tree):
    names = set()
    for node in tree.body:
        if (isinstance(node, ast.Assign) and
                any(isinstance(t, ast.Name) and t.id == '__all__'
                    for t in node.targets)):
            try:
                names.update(ast.literal_eval(node.value))
            except (ValueError, SyntaxError):
                pass
    return names


def _is_reexport_module(tree):
    """True when the module body is only docstring/imports/__all__."""
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        if isinstance(node, ast.Expr) and isinstance(node.value,
                                                     ast.Constant):
            continue  # docstring
        if isinstance(node, ast.Assign):
            continue  # __all__ or simple aliases
        return False
    return True


def check_file(path):
    errors = []
    with open(path, encoding='utf-8') as handle:
        source = handle.read()

    try:
        tree = ast.parse(source, filename=path)
    except SyntaxError as exc:
        return ['{}:{}: E999 syntax error: {}'.format(
            path, exc.lineno, exc.msg)]

    for lineno, line in enumerate(source.splitlines(), 1):
        stripped = line.rstrip('\n')
        if len(stripped) > MAX_LINE and not any(
                marker in stripped for marker in _URL_MARKERS):
            errors.append('{}:{}: E501 line too long ({} > {})'.format(
                path, lineno, len(stripped), MAX_LINE))
        if stripped != stripped.rstrip():
            errors.append('{}:{}: W291 trailing whitespace'.format(
                path, lineno))
        indent = stripped[:len(stripped) - len(stripped.lstrip())]
        if '\t' in indent:
            errors.append('{}:{}: W191 tab in indentation'.format(
                path, lineno))

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            errors.append('{}:{}: E722 bare except'.format(
                path, node.lineno))

    if not _is_reexport_module(tree):
        exported = _module_all(tree)
        used = _used_names(tree)
        for node, alias, bound, explicit in _collect_imports(tree):
            if explicit or bound in exported or bound in used:
                continue
            if bound == '__future__' or alias.name == '__future__':
                continue
            errors.append('{}:{}: F401 {!r} imported but unused'.format(
                path, node.lineno, bound))

    return errors


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = argv or [os.path.join(repo_root, p) for p in DEFAULT_ROOTS]
    all_errors = []
    for path in _iter_py_files(paths):
        all_errors.extend(check_file(path))
    for error in all_errors:
        print(error)
    return 1 if all_errors else 0


if __name__ == '__main__':
    sys.exit(main())
