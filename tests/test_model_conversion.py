"""Conversion mapping parity: plan-generated tables vs the reference's
hand-written movers (tools/model_conversion.py) — exact set equality."""

from tests import ref_utils


def _pairs(mapping):
    return {(a, b) for a, b in mapping}


def test_sdwebui_mapping_matches_reference():
    ref_utils.load_reference()
    import sys
    sys.path.insert(0, "/root/reference/tools")
    from tools.model_conversion import sdwebui_diffuser_to_pfd_mover as RefMover

    from pfd_tpu.tools.model_conversion import sdwebui_diffuser_to_pfd_mover

    ref = _pairs(RefMover().get_mapping())
    ours = _pairs(sdwebui_diffuser_to_pfd_mover().get_mapping())
    missing = ref - ours
    extra = ours - ref
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:5]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:5]}"


def test_hf_mapping_matches_reference():
    ref_utils.load_reference()
    from tools.model_conversion import sdhuggingface_diffuser_to_pfd_mover as RefMover

    from pfd_tpu.tools.model_conversion import sdhuggingface_diffuser_to_pfd_mover

    ref = _pairs(RefMover().get_mapping())
    ours = _pairs(sdhuggingface_diffuser_to_pfd_mover().get_mapping())
    missing = ref - ours
    extra = ours - ref
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:5]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:5]}"
