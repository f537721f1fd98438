import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.data import pipeline as pipe
from openvision_tpu.evaluators import contrastive
from openvision_tpu.models import clip as clip_mod
from openvision_tpu.parallel import create_mesh, unbox


def test_contrastive_monitor():
    model = clip_mod.Model(
        out_dim=(32, 32),
        image=dict(variant="mu/16", posemb="sincos2d", pool_type="gap",
                   output_tokens=True, emb_head_bias=False),
        text=dict(variant="Ti", pool_type="last", vocab_size=30522,
                  output_tokens=True),
        text_decoder="none",
    )
    image = jnp.zeros((2, 32, 32, 3))
    text = jnp.zeros((2, 16), jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(0), image, text)["params"])

    mesh = create_mesh(data=8)
    src = pipe.DictSource({
        "image": np.random.rand(16, 32, 32, 3).astype(np.float32),
        "labels": np.random.randint(0, 30522, (16, 16)).astype(np.int32),
    })
    ev = contrastive.Evaluator(model, mesh, batch_size=8, num_batches=2, source=src)
    metrics = dict(ev.run({"params": params}))
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["ncorrect"] <= 1.0
