"""convert_cli .pth -> .npz conversion roundtrip."""

import numpy as np
import torch

from attention_based_tbn_tpu.models.convert_cli import (
    flatten,
    load_npz,
    main,
    save_npz,
    unflatten,
)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones(3), "c": {"d": np.zeros((2, 2))}}, "e": np.full(1, 7.0)}
    flat = flatten(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    rebuilt = unflatten(flat)
    np.testing.assert_array_equal(rebuilt["a"]["c"]["d"], np.zeros((2, 2)))


def test_cli_bninception(tmp_path):
    from tests.test_convert import synth_bninception_state_dict

    sd = synth_bninception_state_dict()
    in_path = tmp_path / "tower.pth"
    torch.save(sd, in_path)
    out_path = tmp_path / "tower.npz"

    main(
        [
            "--input", str(in_path),
            "--kind", "bninception",
            "--in-channels", "1",
            "--output", str(out_path),
        ]
    )
    params, stats = load_npz(str(out_path))
    assert params["conv1_7x7_s2"]["conv"]["kernel"].shape == (7, 7, 1, 64)
    assert stats["inception_5b"]["pool_proj"]["bn"]["var"].shape == (128,)
