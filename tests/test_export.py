"""Round-trip: our params → reference state dict → converted back → equal."""

import numpy as np
import jax
import jax.numpy as jnp

from alpro_tpu.checkpoint.export_torch import export_reference_state_dict
from alpro_tpu.checkpoint.torch_convert import convert_reference_state_dict
from alpro_tpu.models import BertConfig, TimeSformerConfig, build_pretrain_model


def test_export_convert_roundtrip():
    vis = TimeSformerConfig(
        img_size=48, patch_size=16, num_frames=2, embed_dim=32, depth=2,
        num_heads=4,
    )
    bert = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64, fusion_layer=2,
    )
    model = build_pretrain_model(bert, vis, num_entities=6)
    pixels = jnp.zeros((1, 2, 48, 48, 3))
    ids = jnp.ones((1, 5), jnp.int32)
    mask = jnp.ones((1, 5), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, pixels, ids, mask)

    sd = export_reference_state_dict(params)
    # reference key space spot checks
    assert "visual_encoder.model.blocks.0.attn.qkv.weight" in sd
    assert "text_encoder.bert.encoder.layer.3.output.LayerNorm.weight" in sd
    assert "text_encoder.cls.predictions.decoder.weight" in sd
    assert "mpm_head.2.weight" in sd
    assert sd["visual_encoder.model.patch_embed.proj.weight"].shape == (32, 3, 16, 16)

    back = convert_reference_state_dict(
        sd, depth=2, num_bert_layers=4,
        num_patches=vis.num_patches, num_frames=2,
    )

    flat_a = jax.tree_util.tree_leaves_with_path(params["params"])
    flat_b = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(back["params"])
    )
    n_checked = 0
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        if ks in flat_b:
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat_b[ks]), atol=1e-6,
                err_msg=ks,
            )
            n_checked += 1
    # everything except the prompter-absent pieces must round-trip
    assert n_checked >= len(flat_a) - 2, (n_checked, len(flat_a))


def test_datalist_formats(tmp_path):
    import json

    import pandas as pd

    from alpro_tpu.data.datasets import load_datalist

    rows = [{"video_id": "v1", "caption": "a dog"}, {"video_id": "v2", "caption": "a cat"}]
    jl = tmp_path / "a.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    js = tmp_path / "a.json"
    with open(js, "w") as f:
        json.dump(rows, f)
    pk = tmp_path / "a.pkl"
    pd.DataFrame(rows).to_pickle(pk)

    for path in (js, pk, jl):
        out = load_datalist(str(path))
        assert out[0]["vid_id"] == "v1" and out[0]["txt"] == "a dog"
        assert out[1]["vid_id"] == "v2"
