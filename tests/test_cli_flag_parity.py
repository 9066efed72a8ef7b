"""CLI option-string parity vs the reference entry points.

AST-diffs every `add_argument` option string of the nine reference root CLIs
(/root/reference/{train,val,val2,val_optimizer,export,decompose_model,
create_swa_model,distillation,train_repr}.py) against the matching
`cli/*.py` here. Parity contract: every option string the reference
registers (e.g. ``--log_dir`` at reference train.py:72, ``--nms_type`` at
reference val.py:187, ``-ktk`` at reference export.py:62) must be accepted
by our parser — extra options on our side are allowed (bench/profile
additions), missing reference spellings are not.
"""
import ast
from pathlib import Path

import pytest

REF_ROOT = Path("/root/reference")
REPO_ROOT = Path(__file__).resolve().parents[1]

ENTRY_POINTS = [
    "train.py",
    "val.py",
    "val2.py",
    "val_optimizer.py",
    "export.py",
    "decompose_model.py",
    "create_swa_model.py",
    "distillation.py",
    "train_repr.py",
]


def _option_strings(path: Path) -> set:
    """Collect every string literal passed positionally to add_argument."""
    tree = ast.parse(path.read_text())
    opts = set()
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        func = node.func
        if not (isinstance(func, ast.Attribute) and func.attr == "add_argument"):
            continue
        for arg in node.args:
            if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                opts.add(arg.value)
    return opts


@pytest.mark.parametrize("entry", ENTRY_POINTS)
def test_reference_option_strings_accepted(entry):
    ref = REF_ROOT / entry
    ours = REPO_ROOT / "cli" / entry
    if not ref.exists():
        pytest.skip(f"reference {entry} not present in mount")
    ref_opts = _option_strings(ref)
    our_opts = _option_strings(ours)
    missing = sorted(ref_opts - our_opts)
    assert not missing, (
        f"{entry}: reference option strings not registered here: {missing}"
    )
