"""Transformer training-step throughput on TPU (flagship config)."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from qaig_tpu.models.codebook import Codebook
from qaig_tpu.models.transformer import Transformer, TransformerConfig
from qaig_tpu.train.optim import make_adam
from qaig_tpu.train.transformer import make_train_step
from qaig_tpu.ops import attention


def main(batch=64, use_flash=None, remat=False, bf16=False):
    if use_flash is not None:
        attention.set_flash_enabled(use_flash)
    k = 512
    lr_cb = Codebook(patch_dim=(4, 4), image_dim=(32, 32), image_channel=4,
                     num_embeddings=k, init_neighbour_range=1)
    hr_cb = Codebook(patch_dim=(2, 2), image_dim=(32, 32), image_channel=4,
                     num_embeddings=k, init_neighbour_range=1)
    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=True, num_enc_layers=5,
        num_dec_layers=7, num_enc_embedding=k, num_dec_embedding=k + 1,
        self_attn_heads=8, cross_attn_heads=8, in_dim=512, out_dim=k + 1,
        hidden_dim=2048, hidden_activation="silu", use_remat=remat)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_adam(1e-4, 50_000)
    opt_state = optimizer.init(params)
    lr_p = lr_cb.init(jax.random.PRNGKey(1))
    hr_p = hr_cb.init(jax.random.PRNGKey(2))
    step = make_train_step(model, optimizer, lr_cb, hr_cb, False, k, k,
                           sliding_window=256, bf16=bf16)

    fmap = jnp.zeros((batch, 4, 32, 32), jnp.float32)
    key = jax.random.PRNGKey(3)
    params, opt_state, loss = step(params, opt_state, (lr_p, hr_p), fmap,
                                   key)
    _ = float(loss)

    # XLA cost analysis of the whole jitted step (fwd + bwd + Adam)
    try:
        lowered = step.lower(params, opt_state, (lr_p, hr_p), fmap, key)
        flops = lowered.compile().cost_analysis()["flops"]
    except Exception:
        flops = None
    n = 10
    t0 = time.time()
    acc = jnp.zeros(())
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, (lr_p, hr_p),
                                       fmap, jax.random.PRNGKey(i))
        acc = acc + loss
    _ = float(acc)
    dt = (time.time() - t0) / n
    tag = f"flash={use_flash} remat={remat} batch={batch} bf16={bf16}"
    extra = ""
    if flops:
        peak = 197e12  # v5e dense bf16 peak
        achieved = flops / dt
        extra = (f", {achieved / 1e12:.1f} TFLOP/s"
                 f" (mfu {achieved / peak:.3f} vs bf16 peak)")
    print(f"{tag}: {dt * 1000:.1f} ms/step, "
          f"{batch / dt:.1f} samples/sec{extra}")


if __name__ == "__main__":
    import sys as _sys
    from qaig_tpu.utils import compiler_options as _copts
    _copts.install_from_env()  # QAIG_COMPILER_OPTIONS reaches every jit
    if "--bf16-ab" in _sys.argv:
        main(use_flash=False)
        main(use_flash=False, bf16=True)
        main(use_flash=False, batch=128)
        main(use_flash=False, batch=128, bf16=True)
        main(use_flash=False, batch=256, bf16=True)
    else:
        main(use_flash=True)
        main(use_flash=False)
