"""Token-for-token generation parity against the reference's ACTUAL
``generate_images.py`` decode loop (not a re-derivation).

The reference module is imported from ``/root/reference`` and its ``main()``
is executed on fabricated torch-format checkpoints of a 2-stage cascade
(base model -> sliding-window encoder-decoder).  Sampling RNG is sidestepped
by monkeypatching both frameworks' samplers to greedy argmax over the same
(<end>-masked) distribution, and the stage-0 conditioning grid is pinned to
a fixed tensor on both sides.  Every stage's final token grid must match
exactly — this pins the beam segmentation, the sliding-window slicing, the
base-model index shift, AND the reference's generation-time position
off-by-one (``generate_images.py:315-319`` appends slot+1, unlike the
training preview's slot) against the KV-cached engine.
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not available")
torch = pytest.importorskip("torch")

if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

NUM_IMAGES = 2
LR_K, MID_K, HR_K = 6, 10, 12
INIT_TOKENS = np.array([[3], [1]], dtype=np.int64)  # stage-0 conditioning


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _load_ref_generate():
    # torchvision is not in this image; the reference only uses it inside
    # save_images (try/except-guarded).  Stub the module so the import
    # succeeds — image bytes are irrelevant to token parity.
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda images, **kw: images[0]
        tv_utils.save_image = lambda img, path: None
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    spec = importlib.util.spec_from_file_location(
        "ref_generate_images", REFERENCE / "generate_images.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_reference_checkpoints(tmp_path):
    """Fabricate torch-format checkpoints for decoder + 3 codebooks +
    2 transformers, exactly the dict schemas the reference CLIs write."""
    from models.FC_Decoder import FC_Decoder
    from models.Codebook import Codebook as RefCodebook
    from models.Transformer import Transformer as RefTransformer

    torch.manual_seed(0)
    paths = {}

    dec = FC_Decoder(num_layers=2, image_channel=3, min_channel=8,
                     max_channel=16, latent_channel=2,
                     hidden_activation_type="silu",
                     use_final_activation=True,
                     final_activation_type="tanh")
    paths["decoder"] = str(tmp_path / "decoder.pt")
    torch.save({
        "num_layers": 2, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh",
        "model": dec.state_dict()}, paths["decoder"])

    def save_cb(name, patch, k):
        cb = RefCodebook(patch_dim=(patch, patch), image_dim=(4, 4),
                         image_channel=2, num_embeddings=k,
                         init_neighbour_range=1)
        paths[name] = str(tmp_path / f"{name}.pt")
        torch.save({
            "patch_dim": (patch, patch), "image_dim": (4, 4), "image_C": 2,
            "num_embeddings": k, "neighbourhood_range": 1,
            "checkpoint": cb.state_dict()}, paths[name])

    save_cb("cb_a", 4, LR_K)    # 1 token / latent
    save_cb("cb_b", 2, MID_K)   # 4 tokens
    save_cb("cb_c", 1, HR_K)    # 16 tokens

    # stage 0: base model (decoder-only), no sliding window
    base = RefTransformer(
        use_encoder=False, use_pos_cond=False, num_dec_layers=2,
        num_dec_embedding=LR_K + MID_K, self_attn_heads=2,
        transformer_in_dim=32, transformer_out_dim=MID_K + 1,
        transformer_hidden_dim=64, hidden_activation="silu")
    paths["tf0"] = str(tmp_path / "tf0.pt")
    torch.save({
        "train_base_model": True, "use_sliding_window": False,
        "sliding_window": None, "num_enc_layers": None,
        "num_dec_layers": 2, "num_enc_embedding": None,
        "num_dec_embedding": LR_K + MID_K, "self_attn_heads": 2,
        "cross_attn_heads": None, "transformer_in_dim": 32,
        "transformer_out_dim": MID_K + 1, "transformer_hidden_dim": 64,
        "hidden_activation": "silu", "model": base.state_dict()},
        paths["tf0"])

    # stage 1: encoder-decoder with sliding window 8 over 16+1 tokens —
    # exercises the cached -> crossing -> windowed hybrid decode
    torch.manual_seed(0)  # pins the offset-sensitive trajectory below
    casc = RefTransformer(
        use_encoder=True, use_pos_cond=True, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=MID_K,
        num_dec_embedding=HR_K + 1, self_attn_heads=2, cross_attn_heads=2,
        transformer_in_dim=32, transformer_out_dim=HR_K + 1,
        transformer_hidden_dim=64, hidden_activation="silu")
    # The reference zero-inits AdaLN scale/shift weights, which makes a
    # fresh model blind to position conditioning — randomize exactly those
    # so the test detects position-semantics divergence (verified: with
    # this seed, shifting generated-token positions by one flips the
    # greedy trajectory, so the reference's generation-time position
    # off-by-one is actually pinned).
    with torch.no_grad():
        for name, p in casc.named_parameters():
            if "scale" in name or "shift" in name:
                p.normal_(0, 0.3)
    paths["tf1"] = str(tmp_path / "tf1.pt")
    torch.save({
        "train_base_model": False, "use_sliding_window": True,
        "sliding_window": 8, "num_enc_layers": 1,
        "num_dec_layers": 2, "num_enc_embedding": MID_K,
        "num_dec_embedding": HR_K + 1, "self_attn_heads": 2,
        "cross_attn_heads": 2, "transformer_in_dim": 32,
        "transformer_out_dim": HR_K + 1, "transformer_hidden_dim": 64,
        "hidden_activation": "silu", "model": casc.state_dict()},
        paths["tf1"])

    config = {
        "0": {"model_path": paths["tf0"], "lr_codebook_path": paths["cb_a"],
              "hr_codebook_path": paths["cb_b"], "temperature": 1.0,
              "num_beam": 2, "beam_width": 2},
        "1": {"model_path": paths["tf1"], "lr_codebook_path": paths["cb_b"],
              "hr_codebook_path": paths["cb_c"], "temperature": 1.0,
              "num_beam": 2, "beam_width": 4},
    }
    paths["config"] = str(tmp_path / "gen_config.json")
    with open(paths["config"], "w") as f:
        json.dump(config, f)
    return paths


def _run_reference(paths, out_dir, monkeypatch):
    """Execute the reference's actual main() with greedy sampling and the
    pinned stage-0 grid; capture every token grid it decodes to pixels."""
    from models.Codebook import Codebook as RefCodebook

    ref_gen = _load_ref_generate()

    monkeypatch.setattr(
        torch, "multinomial",
        lambda probs, n, **kw: probs.argmax(dim=1, keepdim=True))
    monkeypatch.setattr(
        torch, "randint",
        lambda *a, **kw: torch.from_numpy(INIT_TOKENS.copy()))

    recorded = []
    orig = RefCodebook.get_quantized_image

    def recording(self, indices, unpatchify_input=True):
        recorded.append(indices.detach().cpu().numpy().copy())
        return orig(self, indices, unpatchify_input=unpatchify_input)

    monkeypatch.setattr(RefCodebook, "get_quantized_image", recording)
    monkeypatch.setattr(sys, "argv", [
        "generate_images.py", "--device", "cpu",
        "--decoder-path", paths["decoder"],
        "--config-path", paths["config"],
        "--num-images", str(NUM_IMAGES),
        "--out-dir", str(out_dir)])
    ref_gen.main()
    # calls: stage0 cond grid, stage0 final, stage1 final
    assert len(recorded) == 3
    return recorded


def _run_ours(paths, out_dir, monkeypatch):
    import jax
    import jax.numpy as jnp
    from qaig_tpu.infer import generate

    monkeypatch.setattr(
        jax.random, "categorical",
        lambda rng, logits, axis=-1, **kw: jnp.argmax(logits, axis=axis))
    monkeypatch.setattr(
        jax.random, "randint",
        lambda *a, **kw: jnp.asarray(INIT_TOKENS, jnp.int32))

    recorded = []
    orig = generate.generate_stage_tokens

    def recording(*a, **kw):
        out = orig(*a, **kw)
        recorded.append(np.asarray(out))
        return out

    monkeypatch.setattr(generate, "generate_stage_tokens", recording)
    generate.run({"config_path": paths["config"],
                  "decoder_path": paths["decoder"],
                  "num_images": NUM_IMAGES, "seed": 0,
                  "out_dir": str(out_dir)})
    return recorded


@pytest.mark.slow
def test_cascade_generation_token_parity(tmp_path, monkeypatch):
    paths = _build_reference_checkpoints(tmp_path)
    ref_tokens = _run_reference(paths, tmp_path / "ref_out", monkeypatch)
    our_tokens = _run_ours(paths, tmp_path / "our_out", monkeypatch)

    np.testing.assert_array_equal(ref_tokens[0], INIT_TOKENS)
    assert ref_tokens[1].shape == (NUM_IMAGES, 4)
    assert ref_tokens[2].shape == (NUM_IMAGES, 16)
    np.testing.assert_array_equal(our_tokens[0], ref_tokens[1],
                                  err_msg="stage 0 (base) tokens diverge")
    np.testing.assert_array_equal(our_tokens[1], ref_tokens[2],
                                  err_msg="stage 1 (sliding window) tokens "
                                          "diverge")
