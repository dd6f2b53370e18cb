"""CLI argument-surface parity vs the reference, checked mechanically.

Extracts every ``add_argument`` call from the reference's
``eval_ood_detection.py`` (AST, no import — the reference pulls in CUDA
torch at module scope) and asserts our parser registers each flag with the
same default, and choices that are a superset (ours adds ``odin`` to
``--score``; everything else must match exactly).  Skipped when the
reference tree isn't mounted.
"""

import ast
import os

import pytest

REF = "/root/reference/eval_ood_detection.py"


def _literal(node):
    try:
        return ast.literal_eval(node)
    except (ValueError, TypeError, SyntaxError):
        return _SKIP


_SKIP = object()


def reference_args():
    """{option_string: {"default": ..., "choices": ...}} from the AST."""
    tree = ast.parse(open(REF).read())
    out = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            continue
        opts = [a.value for a in node.args
                if isinstance(a, ast.Constant) and str(a.value).startswith("-")]
        if not opts:
            continue
        kw = {k.arg: _literal(k.value) for k in node.keywords}
        # the long option names the flag; argparse stores both
        out[max(opts, key=len)] = kw
    return out


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_every_reference_flag_is_registered_compatibly():
    from eval_ood_detection import build_parser
    parser = build_parser()
    ours = parser._option_string_actions

    ref = reference_args()
    assert len(ref) >= 15  # the reference registers 16 user flags
    for opt, kw in ref.items():
        assert opt in ours, f"reference flag {opt} not registered"
        action = ours[opt]
        default = kw.get("default", _SKIP)
        if default is not _SKIP:
            assert action.default == default, (
                f"{opt}: default {action.default!r} != reference "
                f"{default!r}")
        choices = kw.get("choices", _SKIP)
        if choices is not _SKIP and choices is not None:
            assert set(choices) <= set(action.choices or ()), (
                f"{opt}: choices {action.choices} missing reference "
                f"values {set(choices) - set(action.choices or ())}")


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_reference_type_bool_quirk_preserved():
    """The reference's ``type=bool`` flags parse any non-empty string as
    True and '' as False (the documented argparse footgun) — the
    compatibility surface keeps that behavior verbatim."""
    from eval_ood_detection import build_parser
    args = build_parser().parse_args(
        ["--normalize", "False", "--generate", "", "--subset", "0"])
    assert args.normalize is True      # non-empty string → True (sic)
    assert args.generate is False      # empty string → False
    assert args.subset is True         # "0" is non-empty → True (sic)
