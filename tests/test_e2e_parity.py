"""Full-dress end-to-end parity rehearsal against the LIVE reference code.

VERDICT round-1 item 5: tower-level oracles compose into a pipeline-level
statement.  Both stacks run on the SAME synthetic fixture tree, the SAME
locally-instantiated HF BertModel + BertTokenizer (random-but-fixed weights),
and the SAME pre-extracted image features:

* reference side — /root/reference's actual modules (ImageLabelDataset,
  DataLoaders, ClassifierExperiment, Evaluator, PromptClassifier), imported
  with sys.modules shims for deps absent in this image (fuzzywuzzy,
  torchvision, prettytable) — none of which are on the exercised code path.
* our side — the standard train.run entry-point flow with the text tower
  converted from the identical HF checkpoint via tools/convert_bert.py and
  loaded through networks.text_encoder.weights_path.

Gates:
1. dataset parity — identical (image_id -> text) supervision on both stacks;
2. quality parity — full-dataset zero-shot malignancy AUC delta <= 0.5%
   (BASELINE.json gate) after each stack trains its own heads;
3. numeric parity — reference-trained weights transplanted into our model
   reproduce the reference logits; cascade argmaxes match the reference
   PromptClassifier step-by-step, so generated reports are structurally
   identical (assembly equality is covered by tests/test_report_compat.py).
"""

import os
import runpy
import sys
import types

import numpy as np
import pytest

import mmgclip_tpu
from mmgclip_tpu.config import Config, compose, save_snapshot
from fixtures import build_image_label_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")
REFERENCE = "/root/reference"
VOCAB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "vocab_fixture.txt")

pytestmark = pytest.mark.slow

SEED = 42
EPOCHS = 10
HIDDEN = 64


def _install_reference_shims():
    """Stub the reference's unavailable imports; none are on the exercised
    path (fuzzywuzzy -> report preprocessing, torchvision -> pixel encoders,
    prettytable -> param-count table)."""
    import difflib
    import importlib.machinery

    import torch

    def _module(name):
        mod = types.ModuleType(name)
        # a real ModuleSpec: importlib.util.find_spec probes on stubs
        # (e.g. datasets/config.py) raise ValueError on __spec__ = None
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    if "fuzzywuzzy" not in sys.modules:
        fuzz_mod = _module("fuzzywuzzy")
        process_mod = _module("fuzzywuzzy.process")

        def extract_one(query, choices):
            scored = [
                (difflib.SequenceMatcher(None, query, c).ratio(), c) for c in choices
            ]
            score, best = max(scored)
            return best, int(score * 100)

        process_mod.extractOne = extract_one
        fuzz_mod.process = process_mod
        sys.modules["fuzzywuzzy"] = fuzz_mod
        sys.modules["fuzzywuzzy.process"] = process_mod

    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tv_models = _module("torchvision.models")
        tv_transforms = _module("torchvision.transforms")

        class _ToTensor:
            def __call__(self, x):
                return x

        class _Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for fn in self.fns:
                    x = fn(x)
                return x

        tv_transforms.ToTensor = _ToTensor
        tv_transforms.Compose = _Compose
        tv.models = tv_models
        tv.transforms = tv_transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.transforms"] = tv_transforms

    if "prettytable" not in sys.modules:
        pt = _module("prettytable")

        class PrettyTable:
            def __init__(self, field_names=None):
                self.field_names = field_names or []
                self.rows = []

            def add_row(self, row):
                self.rows.append(row)

            def __str__(self):
                lines = ["\t".join(str(c) for c in self.field_names)]
                lines += ["\t".join(str(c) for c in row) for row in self.rows]
                return "\n".join(lines)

        pt.PrettyTable = PrettyTable
        sys.modules["prettytable"] = pt

    # the reference pins torch 1.13 (weights_only=False era); its EarlyStopper
    # checkpoints carry numpy scalars, which torch>=2.6's weights_only loader
    # rejects — allowlist them (trusted: we wrote the file seconds ago)
    try:
        torch.serialization.add_safe_globals(
            [np._core.multiarray.scalar, np.dtype, type(np.dtype(np.float64))]
        )
    except Exception:
        pass

    # reference CLIPLoss hardcodes .cuda() (reference: losses.py:39); no CUDA
    # here, so make the device move a no-op
    if not torch.cuda.is_available() and not getattr(torch.Tensor.cuda, "_shimmed", False):
        def _cuda_noop(self, *args, **kwargs):
            return self

        _cuda_noop._shimmed = True
        torch.Tensor.cuda = _cuda_noop

    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)  # appended: our repo modules keep priority


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    root = tmp_path_factory.mktemp("parity")
    base, annotated, lists_dir, features = build_image_label_tree(
        str(root), n_benign=16, n_malignant=16, image_size=32,
        feature_store=True, separable=True, torch_feature_store=True,
    )

    # one local HF checkpoint both stacks consume
    hf_dir = str(root / "hf_bert")
    with open(VOCAB, encoding="utf-8") as fh:
        vocab_size = sum(1 for line in fh if line.strip())
    torch.manual_seed(0)
    bert = BertModel(
        BertConfig(
            vocab_size=vocab_size, hidden_size=HIDDEN, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=64, type_vocab_size=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
    )
    bert.eval()
    bert.save_pretrained(hf_dir)
    BertTokenizer(vocab_file=VOCAB).save_pretrained(hf_dir)

    # convert the same checkpoint for our text tower (exercises the tool)
    msgpack = str(root / "bert_converted.msgpack")
    argv = sys.argv
    sys.argv = ["convert_bert.py", "--input", hf_dir, "--output", msgpack]
    try:
        runpy.run_path(os.path.join(REPO, "tools", "convert_bert.py"), run_name="__main__")
    finally:
        sys.argv = argv

    return {
        "root": root, "base": base, "annotated": annotated, "lists": lists_dir,
        "features": features, "torch_features": str(root / "features_torch"),
        "hf_dir": hf_dir, "msgpack": msgpack, "vocab_size": vocab_size,
    }


def _reference_config(ws, run_dir):
    return Config(
        {
            "base": {
                "seed": SEED, "patience": EPOCHS,
                "features_export_dir": ws["torch_features"],
                "export_dir": str(run_dir),
                "results_export_dir": str(run_dir / "results"),
                "tensorboard_export_dir": str(run_dir / "runs"),
            },
            "checkpoints": {
                "checkpoints_export_dir": str(run_dir / "checkpoints"),
                "checkpoints_file_name": "model.pth",
            },
            "dataset": {
                "name": "ImageLabelDataset",
                "config": {
                    "enums_class": "BenignMalignantDatasetLabels",
                    "search_col": "image_label",
                    "generate_label_prompt_sentence": False,
                    "generate_label_prompt_report": False,
                    "base_dataset_path": ws["base"],
                    "annotated_dataset_path": ws["annotated"],
                    "lists_dataset_path": ws["lists"],
                },
                "eval": {
                    "enum_classes": ["BenignMalignantDatasetLabels"],
                    "method": ["zeroshot_label_prompt"],
                    "dataset": {"name": "ImageLabelDataset"},
                },
                "split": {"train_split_ratio": 0.7, "test_split_ratio": 0.5},
                "template": {"prompt_template": "", "label": [], "template_keys": []},
            },
            "tokenizer": {"config": {"tokenizer_name": ws["hf_dir"], "sequence_length": 32}},
            "networks": {
                "logit_temperature": 0.07,
                "image_encoder": {
                    "name": "ConvNextTiny",
                    "convnext_tiny_clf_path": "",
                    "image_features_dimension": 768,
                },
                "text_encoder": {"name": "BertEncoder"},
                "dropout": {"config": {"dropout": 0.0}},
            },
            "projection": {
                "config": {"projection_name": "LinearProjectionLayer",
                           "output_projection_dimension": 64}
            },
            "loss": {"config": {"loss_name": "CLIPLoss"}},
            "optimizer": {"config": {"learning_rate": 5e-3, "weight_decay": 1e-4}},
            "scheduler": {"name": "cosine", "config": {"warmup_epochs": 0.1, "epochs": EPOCHS}},
            "experiments": {
                "config": {"experiment_name": "classification",
                           "metrics": ["BenignMalignantDatasetLabels"]}
            },
        }
    )


@pytest.fixture(scope="module")
def reference_run(workspace, tmp_path_factory):
    """Train the reference stack end-to-end; return its live pieces."""
    _install_reference_shims()
    run_dir = tmp_path_factory.mktemp("ref_run")
    cfg = _reference_config(workspace, run_dir)

    from mmgclip.dataset.dataset import get_dataset
    from mmgclip.dataset.dataloaders import DataLoaders
    from mmgclip.experiments.experiments_controller import create_experiment
    from mmgclip.utils.global_utils import seeding

    seeding(SEED)
    dataset = get_dataset(cfg.dataset.name)(config=cfg)
    assert len(dataset.dataset_pth) == 32

    train_split, rest = dataset.random_split(dataset, "train")
    val_split, test_split = dataset.random_split(rest, "test")

    def loader(split, shuffle, drop_last, batch_size=8):
        return DataLoaders(config=cfg, dataset_split=split).get_dataloader(
            shuffle=shuffle, batch_size=batch_size, drop_last=drop_last,
            pin_memory=False, collate_fn=dataset.collate_fn,
            num_workers=1, prefetch_factor=2,
        )

    full_loader = loader(dataset, shuffle=False, drop_last=False)
    experiment = create_experiment("classification")(
        config=cfg,
        train_dataloader=loader(train_split, shuffle=True, drop_last=True),
        valid_dataloader=loader(val_split, shuffle=False, drop_last=False),
        test_dataloader=full_loader,
        tokenizer=dataset.tokenizer,
    )
    experiment.run()

    return {
        "cfg": cfg, "dataset": dataset, "experiment": experiment,
        "full_loader": full_loader, "run_dir": run_dir,
    }


@pytest.fixture(scope="module")
def our_run(workspace, tmp_path_factory):
    """Train our stack through the standard entry-point flow."""
    import train

    run_dir = tmp_path_factory.mktemp("our_run")
    cfg = compose(CONFIG_DIR, "train_binary_class_clf", run_dir=str(run_dir))
    cfg.dataset.config.base_dataset_path = workspace["base"]
    cfg.dataset.config.annotated_dataset_path = workspace["annotated"]
    cfg.dataset.config.lists_dataset_path = workspace["lists"]
    cfg.base.features_export_dir = workspace["features"]
    cfg.base.export_dir = str(run_dir)
    cfg.base.results_export_dir = str(run_dir / "results")
    cfg.base.tensorboard_export_dir = str(run_dir / "runs")
    cfg.checkpoints.checkpoints_export_dir = str(run_dir / "checkpoints")
    cfg.tokenizer.config.tokenizer_name = workspace["hf_dir"]
    cfg.tokenizer.config.sequence_length = 32
    cfg.networks.text_encoder = Config(
        {
            "name": "BertEncoder",
            "weights_path": workspace["msgpack"],
            "config": {
                "vocab_size": workspace["vocab_size"], "hidden_size": HIDDEN,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "intermediate_size": 128, "max_position_embeddings": 64,
            },
        }
    )
    cfg.networks.dropout.config.dropout = 0.0
    cfg.projection.config.output_projection_dimension = 64
    cfg.optimizer.config.learning_rate = 5e-3
    cfg.scheduler.config.epochs = EPOCHS
    cfg.base.patience = EPOCHS
    cfg.dataloader.train.batch_size = 8
    # val/test splits hold ~5 samples each; drop_last with batch 8 would
    # leave zero eval batches
    cfg.dataloader.valid.batch_size = 2
    cfg.dataloader.test.batch_size = 2
    cfg.dataset.eval.method = ["zeroshot_label_prompt"]
    save_snapshot(cfg, str(run_dir))

    train.run(cfg)
    return {"cfg": cfg, "run_dir": run_dir}


def _reference_full_auc(ref):
    """Reference full-dataset zero-shot malignancy AUC via its Evaluator."""
    import torch

    from mmgclip.evaluator import Evaluator
    from mmgclip.prompts.enums import BenignMalignantDatasetLabels

    evaluator = Evaluator(
        config=ref["cfg"], test_dataloader=ref["full_loader"],
        tokenizer=ref["dataset"].tokenizer, model=ref["experiment"].model,
    )
    image_embeddings, prompt_labels = [], []
    with torch.no_grad():
        for batch in ref["full_loader"]:
            image_embeddings.append(evaluator.encode_image(batch))
            prompt_labels.extend(batch["prompt_labels"])
    image_embeddings = np.concatenate(image_embeddings, axis=0)
    classes_dict = {label.name: label.value for label in BenignMalignantDatasetLabels}
    results = evaluator.zeroshot_label_prompt(
        image_embeddings=image_embeddings, label_names=prompt_labels,
        classes_dict=classes_dict, key="BenignMalignantDatasetLabels",
    )
    return {k: v["auc"] for k, v in results.items() if isinstance(v, dict)}


def _our_full_auc(ours):
    cfg = ours["cfg"]
    cfg.base.results_export_dir = str(ours["run_dir"] / "results_full")
    dataset = mmgclip_tpu.get_dataset(cfg.dataset.eval.dataset.name)(config=cfg)
    loader = mmgclip_tpu.DataLoaders(config=cfg, dataset_split=dataset).get_dataloader(
        batch_size=8, shuffle=False, drop_last=False, collate_fn=dataset.collate_fn
    )
    evaluator = mmgclip_tpu.Evaluator(config=cfg, test_dataloader=loader,
                                      tokenizer=dataset.tokenizer)
    results = evaluator.evaluate_experiment()
    for block in results:
        aucs = {k: v["auc"] for k, v in block.items() if isinstance(v, dict) and "auc" in v}
        if aucs:
            return aucs
    raise AssertionError(f"no AUC block in {results!r}")


def test_01_dataset_supervision_identical(workspace, reference_run, our_run):
    """Gate 1: both stacks derive the same (image_id -> text, label) table."""
    ref_df = reference_run["dataset"].dataset_pth
    ref_map = dict(zip(ref_df["image_id"], ref_df[reference_run["dataset"].new_col]))
    ref_labels = dict(zip(ref_df["image_id"], ref_df["image_label"]))

    ours = mmgclip_tpu.get_dataset("ImageLabelDataset")(config=our_run["cfg"])
    our_df = ours.dataset_pth
    our_map = dict(zip(our_df["image_id"], our_df[ours.new_col]))
    our_labels = dict(zip(our_df["image_id"], our_df["image_label"]))

    assert ref_map == our_map
    assert {k: int(v) for k, v in ref_labels.items()} == {
        k: int(v) for k, v in our_labels.items()
    }


def test_02_zeroshot_auc_within_half_percent(reference_run, our_run):
    """Gate 2: full-dataset zero-shot malignancy AUC delta <= 0.5%."""
    ref_aucs = _reference_full_auc(reference_run)
    our_aucs = _our_full_auc(our_run)
    assert set(ref_aucs) == set(our_aucs), (ref_aucs, our_aucs)
    for prompt, ref_auc in ref_aucs.items():
        delta = abs(ref_auc - our_aucs[prompt])
        assert delta <= 0.005, f"{prompt}: ref {ref_auc:.4f} vs ours {our_aucs[prompt]:.4f}"
        assert ref_auc >= 0.95, f"reference failed to learn the planted signal: {ref_auc}"


def test_03_transplanted_weights_reproduce_reference_numerics(workspace, reference_run, our_run):
    """Gate 3a: reference-trained weights moved into our model reproduce the
    reference logits on identical inputs."""
    import torch

    ref_model = reference_run["experiment"].model
    ref_model.eval()

    cfg = our_run["cfg"]
    tokenizer = mmgclip_tpu.Tokenizer.from_pretrained(
        workspace["hf_dir"], sequence_length=32
    )
    model = mmgclip_tpu.MMGCLIP(cfg, seed=0, vocab_size=workspace["vocab_size"])
    params = dict(model.trainable_params)
    params["image_projection"] = {
        "layer": {"kernel": ref_model.image_projection_layer.layer.weight.detach().numpy().T}
    }
    params["text_projection"] = {
        "layer": {"kernel": ref_model.text_projection_layer.layer.weight.detach().numpy().T}
    }
    params["logit_scale"] = np.float32(ref_model.logit_scale.detach().numpy())

    batch = next(iter(reference_run["full_loader"]))
    with torch.no_grad():
        ref_out = ref_model(batch)

    import jax.numpy as jnp

    our_batch = {
        "image_features": jnp.asarray(batch["image_features"].numpy()),
        "text_tokens": {k: jnp.asarray(v.numpy()) for k, v in batch["text_tokens"].items()},
    }
    our_out = model.forward(params, our_batch)
    np.testing.assert_allclose(
        np.asarray(our_out["logits_per_image"]),
        ref_out["logits_per_image"].detach().numpy(),
        atol=5e-3, rtol=1e-3,
    )

    # Gate 3b: cascade decisions == reference PromptClassifier, stepwise
    from mmgclip.networks.mmgclip_model import PromptClassifier as RefPromptClassifier

    from mmgclip_tpu.evaluation.report_cascade import BANKS, decide

    ref_clf = RefPromptClassifier(model=ref_model)
    features = batch["image_features"][:2]
    for i in range(2):
        decisions = decide(model, params, tokenizer, jnp.asarray(features[i].numpy()).reshape(1, -1))
        for bank_name, prompts in BANKS.items():
            ref_result = ref_clf(image_features=features[i : i + 1], class_list=list(prompts),
                                 visualize=False)
            assert decisions[bank_name] == int(ref_result["similarities_argmax"]), bank_name
