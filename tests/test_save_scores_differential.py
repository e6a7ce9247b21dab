"""Byte-level differential: our challenge-JSON emitter vs the reference's.

Runs the reference's *verbatim* ``save_scores`` (imported from
/root/reference/core/utils/misc.py) and ours
(attention_based_tbn_tpu/utils/misc.py) on the same synthetic prediction
stream and compares the emitted files — parsed-equal always, and
byte-identical when scores are tie-free (the only divergence class is
tie-breaking order inside the top-100 action dict: torch ``topk`` breaks
ties low-index-first, ``np.argsort`` reversed breaks them high-index-first;
the *set* of entries is identical either way).

Reference: core/utils/misc.py:115-165, called from core/tools/test.py:228-241.
"""

from __future__ import annotations

import importlib.util
import json
import os

import numpy as np
import pytest

from attention_based_tbn_tpu.utils.misc import save_scores

REFERENCE = "/root/reference/core/utils/misc.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE), reason="reference tree unavailable"
)


def _load_reference_misc():
    spec = importlib.util.spec_from_file_location("ref_misc", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _synthetic_scores(rng, n_batches, batch, n_verb, n_noun, n_action):
    """Per-batch prediction lists exactly as the test loops accumulate them
    (reference test.py:63-73: scores[key].append(batch tensor))."""
    uid = 0
    scores = {"action_id": [], "verb": [], "noun": [], "action": []}
    for _ in range(n_batches):
        scores["action_id"].append(np.arange(uid, uid + batch, dtype=np.int64))
        uid += batch
        scores["verb"].append(rng.standard_normal((batch, n_verb)).astype(np.float32))
        scores["noun"].append(rng.standard_normal((batch, n_noun)).astype(np.float32))
        scores["action"].append(
            rng.standard_normal((batch, n_action)).astype(np.float32)
        )
    return scores


def test_challenge_json_matches_reference_bytes(tmp_path):
    torch = pytest.importorskip("torch")
    ref = _load_reference_misc()

    rng = np.random.default_rng(0)
    n_action = 130  # > 100 so the top-100 truncation path is exercised
    scores = _synthetic_scores(rng, n_batches=3, batch=4, n_verb=7, n_noun=9,
                               n_action=n_action)
    action_names = {i: f"verb_{i % 11}:noun_{i // 11}" for i in range(n_action)}

    ref_file = tmp_path / "ref" / "results.json"
    ours_file = tmp_path / "ours" / "results.json"

    # The reference mutates ``scores`` in place (torch.cat per key) — feed it
    # its own torch copy.
    ref_scores = {
        k: [torch.from_numpy(np.array(a)) for a in v] for k, v in scores.items()
    }
    ref.save_scores(ref_scores, str(ref_file), action_names)
    save_scores(scores, str(ours_file), action_names)

    ref_bytes = ref_file.read_bytes()
    ours_bytes = ours_file.read_bytes()
    assert json.loads(ours_bytes) == json.loads(ref_bytes)
    # Continuous random scores are tie-free, so even the insertion ORDER of
    # the top-100 action dict must agree.
    assert ours_bytes == ref_bytes


def test_challenge_json_without_action_head_matches_reference(tmp_path):
    torch = pytest.importorskip("torch")
    ref = _load_reference_misc()

    rng = np.random.default_rng(3)
    scores = _synthetic_scores(rng, n_batches=2, batch=3, n_verb=5, n_noun=6,
                               n_action=4)
    del scores["action"]  # verb/noun-only recipe: no action head, no names

    ref_file = tmp_path / "ref.json"
    ours_file = tmp_path / "ours.json"
    ref_scores = {
        k: [torch.from_numpy(np.array(a)) for a in v] for k, v in scores.items()
    }
    ref.save_scores(ref_scores, str(ref_file), None)
    save_scores(scores, str(ours_file), None)

    assert ours_file.read_bytes() == ref_file.read_bytes()
