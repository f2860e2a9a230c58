"""Doc-rot guard: every ```python block in docs/tutorials must execute.

The tutorials are the user-facing equivalents of the reference's
notebooks (tutorials/*.ipynb, SURVEY.md §2 'Tutorials'); executing their
code blocks keeps them honest against API drift. Blocks in one file share
a namespace (later blocks may use earlier imports/variables). Tutorials 03
(training), 04 (remote storage) and 05 (serving) are shell/how-to
documents whose snippets need real experiment dirs, object stores or
exported artifacts, so they get the lighter check: every `python -m`
entry point they mention must be importable.
"""

import re
from pathlib import Path

import matplotlib
import pytest

matplotlib.use("Agg")

DOCS = Path(__file__).resolve().parent.parent / "docs" / "tutorials"


def _python_blocks(path: Path):
    return re.findall(r"```python\n(.*?)```", path.read_text(), re.S)


@pytest.mark.parametrize("name", ["01_spherical_samplings.md",
                                  "02_interpolation_pooling.md"])
def test_tutorial_blocks_execute(name, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # any artifacts land in tmp
    path = DOCS / name
    blocks = _python_blocks(path)
    assert blocks, f"{name} has no python blocks"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{name}#block{i}", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"{name} block {i} failed: {e!r}\n---\n{block}")


def test_training_tutorial_commands_reference_real_entry_points():
    # 03/04 are command-oriented; at minimum every `python -m` module they
    # mention must be importable
    import importlib

    for name in ["03_training_forecasting.md", "04_remote_storage.md",
                 "05_serving.md"]:
        src = (DOCS / name).read_text()
        for mod in re.findall(r"python -m ([\w.]+)", src):
            importlib.import_module(mod)
