"""Cross-implementation ``.pt`` embedding interop (VERDICT r1 item 4).

Two directions:
- files written by our ``infer.py`` must load under the EXACT torch
  semantics of the reference probe (ref lp_accel_gpu.py:57-62: bare
  ``torch.load``, ``'fusion'`` + str-modality + frozenset-combo keys,
  boolean mask indexing, ``labels.squeeze()``, FineTuneDataset +
  DataLoader iteration);
- files written the way the reference's ``infer_accel_gpu.py`` writes
  them (torch.save of torch tensors, ref :131-136) must run through our
  ``probe.py`` end-to-end.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mca_tpu.config import (
    get_cfg_defaults_embedding_eval,
    training_config_from_dict,
)
from mca_tpu.data.synthetic import make_tcga_like, tiny_config, to_hf_dataset


@pytest.fixture(scope="module")
def infer_dir(tmp_path_factory):
    """Run our infer.py on an untrained tiny model (format interop
    does not need a trained checkpoint)."""
    import jax

    from mca_tpu import checkpoint as ckpt
    from mca_tpu.config import get_model_config
    from mca_tpu.data.collators import MultimodalCollator
    from mca_tpu.infer import infer
    from mca_tpu.models import build_model

    root = tmp_path_factory.mktemp("interop")
    widths = {"gene": 12, "protein": 8, "methylation": 10, "mirna": 6}
    samples = make_tcga_like(
        32, widths=widths, p_missing=0.2, seed=0, n_classes=4
    )
    ds = to_hf_dataset(samples)
    ds_path = str(root / "dataset")
    ds.save_to_disk(ds_path)

    cfg = training_config_from_dict(
        tiny_config("tcga", widths=widths, batch_size=8)
    )
    cfg.dataset = ds_path
    cfg.split = 0.25

    model = build_model(get_model_config(cfg))
    batch = MultimodalCollator(cfg.modality_config.to_plain())(
        samples[:8]
    )
    params = jax.jit(model.init)(
        jax.random.key(0), jax.tree.map(np.asarray, batch)
    )
    model_dir = str(root / "model")
    ckpt.save_params(params, model_dir)

    cfg.restart = model_dir
    cfg.output_dir = str(root / "inference")
    os.makedirs(cfg.output_dir, exist_ok=True)
    infer(cfg)
    return cfg.output_dir


def test_reference_probe_loader_reads_our_files(infer_dir):
    """Byte-level re-enactment of lp_accel_gpu.py:57-101 on our output."""
    e_train = torch.load(
        f"{infer_dir}/train_embeddings.pt",
        map_location="cpu",
        weights_only=False,
    )
    m_train = torch.load(
        f"{infer_dir}/train_masks.pt",
        map_location="cpu",
        weights_only=False,
    )
    s_train = torch.load(
        f"{infer_dir}/train_labels.pt",
        map_location="cpu",
        weights_only=False,
    ).squeeze()

    # key scheme: 'fusion' + str modalities + frozenset combos
    assert "fusion" in e_train
    assert isinstance(e_train["fusion"], torch.Tensor)
    str_keys = [
        x for x in e_train.keys() if isinstance(x, str) and x != "fusion"
    ]
    assert sorted(str_keys) == ["gene", "methylation", "mirna", "protein"]
    assert any(isinstance(k, frozenset) for k in e_train)

    # the reference indexes embeddings with the mask tensor directly
    # (lp_accel_gpu.py:76-79) — that is BOOLEAN indexing, so our masks
    # must be torch.bool, not int
    for k in str_keys:
        assert m_train[k].dtype == torch.bool, k
        sel = e_train[k][m_train[k]]
        assert sel.shape[0] == int(m_train[k].sum())
        assert sel.shape[1] == e_train[k].shape[1]
        fus = e_train["fusion"][m_train[k]]
        assert fus.shape == sel.shape

    # labels: raw tensor, squeezed, one row per retained sample
    assert s_train.shape[0] == e_train["fusion"].shape[0]

    # FineTuneDataset + DataLoader iteration (lp_accel_gpu.py:23-35,100)
    class FineTuneDataset(torch.utils.data.Dataset):
        def __init__(self, embeddings, labels, key="fusion", index=0):
            self.embeddings = embeddings[key]
            self.labels = labels if index == -1 else labels[:, index]

        def __len__(self):
            return self.labels.shape[0]

        def __getitem__(self, idx):
            return self.embeddings[idx], self.labels[idx]

    dl = torch.utils.data.DataLoader(
        FineTuneDataset(e_train, s_train, index=-1), batch_size=4
    )
    e, l = next(iter(dl))
    assert e.shape[0] == 4 and l.shape[0] == 4
    # a torch linear head must accept the embeddings as-is
    head = torch.nn.Linear(e.shape[1], int(l.shape[1]))
    out = head(e.float())
    assert torch.isfinite(out).all()


def test_our_probe_reads_reference_written_files(infer_dir, tmp_path):
    """Round-trip: rewrite the files exactly as infer_accel_gpu.py:131-136
    does (torch.save of torch-tensor dicts) and run our probe on them."""
    from mca_tpu.infer import load_embedding_file
    from mca_tpu.probe import probe

    ref_dir = tmp_path / "ref_written"
    ref_dir.mkdir()
    for split in ("train", "eval"):
        emb = load_embedding_file(f"{infer_dir}/{split}_embeddings")
        msk = load_embedding_file(f"{infer_dir}/{split}_masks")
        labels = torch.load(
            f"{infer_dir}/{split}_labels.pt",
            map_location="cpu",
            weights_only=False,
        )
        # reference writes torch.cat()-ed tensors keyed by the model's
        # output keys (str + frozenset), masks as bool tensors, labels
        # as one raw tensor
        torch.save(
            {k: torch.as_tensor(np.asarray(v)) for k, v in emb.items()},
            f"{ref_dir}/{split}_embeddings.pt",
        )
        torch.save(
            {k: torch.as_tensor(np.asarray(v)) for k, v in msk.items()},
            f"{ref_dir}/{split}_masks.pt",
        )
        torch.save(labels, f"{ref_dir}/{split}_labels.pt")

    pcfg = get_cfg_defaults_embedding_eval()
    pcfg.embedding_dir = str(ref_dir)
    pcfg.output_dir = str(tmp_path / "probe_out")
    pcfg.task = -1
    pcfg.loss_type = "BCE"
    pcfg.epochs = 5
    pcfg.lr = 1e-3
    pcfg.batch_size = 8
    pcfg.rank_metrics = True  # exercises the frozenset/mask paths too
    metrics = probe(pcfg)
    assert np.isfinite(metrics["train_loss"])
    assert 0.0 <= metrics["eval_f1"] <= 1.0
