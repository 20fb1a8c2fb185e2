"""Executable-docs gate.

The reference CI compiles its README code blocks into Sphinx doctests and
runs them (`/root/reference/.travis/test_docs.sh` -> ``make doctest``,
``build_readme.py``).  Equivalent discipline here: every fenced
```` ```python ```` block in README.md and docs/*.md must at least compile,
and the README's blocks must *execute* in order as written (they form the
quickstart narrative).
"""

import os
import re

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BLOCK_RE = re.compile(r'```python\n(.*?)```', re.DOTALL)


def _doc_files():
    files = [os.path.join(REPO_ROOT, 'README.md')]
    docs = os.path.join(REPO_ROOT, 'docs')
    files.extend(os.path.join(docs, name)
                 for name in sorted(os.listdir(docs))
                 if name.endswith('.md'))
    return files


def _blocks(path):
    with open(path, encoding='utf-8') as handle:
        return _BLOCK_RE.findall(handle.read())


@pytest.mark.parametrize('path', _doc_files(),
                         ids=lambda p: os.path.basename(p))
def test_python_blocks_compile(path):
    for index, block in enumerate(_blocks(path)):
        compile(block, '{}:block{}'.format(os.path.basename(path), index),
                'exec')


def test_readme_blocks_execute():
    """The README quickstart runs end to end, verbatim."""
    blocks = _blocks(os.path.join(REPO_ROOT, 'README.md'))
    assert blocks, 'README.md has no python blocks'
    namespace = {}
    for index, block in enumerate(blocks):
        exec(compile(block, 'README.md:block{}'.format(index), 'exec'),
             namespace)
    # The quickstart's final artifact: a per-sequence MRR array.
    mrr = namespace['mrr']
    assert mrr.shape[0] > 0
    assert 0.0 < float(mrr.mean()) <= 1.0
