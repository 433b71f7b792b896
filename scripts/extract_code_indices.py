#!/usr/bin/env python
"""Export per-sample VQ code indices, encoder latents, and per-token
geometry descriptors for a trained stage-2 model.

TPU-native rebuild of the reference's distributed exporter
(scripts/extract_code_indices.py): instead of raw torch.distributed
(init_process_group("nccl") + DistributedSampler + barrier, reference
:66-70,133-152), multi-host runs shard the file list by
jax.process_index() and rank 0 merges the per-rank manifests at the end
(reference :561-573). RVQ flat indices are re-laid-out from the model's
level-major [Q*B*M] to per-sample token-major [M*Q] like the reference
(:174-246).

Outputs under --out_dir:
  indices/<name>.npy    [N_tokens * Q] int32 code indices (token-major)
  latents/<name>.npy    [N_tokens, D] float32 encoder z_e
  geometry/<name>.npy   [N_tokens, 8] float32 per-token geometry
  manifest_rank{r}.jsonl -> manifest.jsonl (rank-0 merge)
  meta.json             model/checkpoint provenance incl. ckpt sha256
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sha256_of_dir(path: str, limit_bytes: int = 1 << 20) -> str:
    """Stable digest of a checkpoint directory (first MB of each file)."""
    h = hashlib.sha256()
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            p = os.path.join(root, f)
            h.update(f.encode())
            with open(p, "rb") as fh:
                h.update(fh.read(limit_bytes))
    return h.hexdigest()


def token_geometry(curve6: np.ndarray, n_tokens: int) -> np.ndarray:
    """Per-token geometry descriptors [N, 8]: segment center (3),
    unit direction (3), mean beta-channel SS (1), radius (1).

    The valid length L is split into N contiguous segments (reference
    compute_latent_geometry_for_sample, scripts/extract_code_indices.py:
    325-407).
    """
    L = curve6.shape[0]
    coords = curve6[:, :3]
    ss = curve6[:, 3:6] if curve6.shape[1] >= 6 else np.zeros((L, 3))
    bounds = np.linspace(0, L, n_tokens + 1).astype(int)
    out = np.zeros((n_tokens, 8), np.float32)
    for t in range(n_tokens):
        s, e = bounds[t], max(bounds[t] + 1, bounds[t + 1])
        seg = coords[s:e]
        center = seg.mean(axis=0)
        d = seg[-1] - seg[0]
        norm = np.linalg.norm(d)
        direction = d / norm if norm > 1e-8 else np.zeros(3)
        radius = float(np.linalg.norm(seg - center, axis=1).mean())
        out[t, :3] = center
        out[t, 3:6] = direction
        out[t, 6] = float(ss[s:e, 1].mean())
        out[t, 7] = radius
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--split", type=str, default="train",
                    choices=["train", "val"])
    ap.add_argument("--save_latents", action="store_true", default=True)
    ap.add_argument("--save_geometry", action="store_true", default=True)
    # explicit multi-process bring-up (replaces the reference's
    # init_process_group("nccl") from env RANK/WORLD_SIZE, :66-70). On TPU
    # pods jax.distributed.initialize() autodetects; these flags cover
    # CPU/manual worlds.
    ap.add_argument("--coordinator", type=str, default="",
                    help="coordinator address host:port for "
                         "jax.distributed.initialize")
    ap.add_argument("--num_processes", type=int, default=0)
    ap.add_argument("--process_id", type=int, default=-1)
    args = ap.parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    from pytorch_vae_tpu import config as cfglib
    from pytorch_vae_tpu.data.curves import CurveDataset, pad_batch
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    rank = jax.process_index()
    world = jax.process_count()

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    assert bundle.vq_state is not None, "stage-2 model required (use_vq)"
    model = bundle.model
    Q = int(model.num_quantizers)
    n_tokens = bundle.latent_tokens

    cfg = bundle.config
    dp = cfg["data_params"]
    list_name = dp["train_list"] if args.split == "train" else dp["val_list"]
    ds = CurveDataset(
        dp["npy_dir"],
        list_path=cfglib.resolve_path(dp["npy_dir"], list_name),
        train=args.split == "train",
        max_seq_len=int(model.max_seq_len))

    out = args.out_dir
    for sub in ("indices", "latents", "geometry"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    manifest_path = os.path.join(out, f"manifest_rank{rank}.jsonl")

    # per-process strided shard of the sample list (replaces
    # DistributedSampler)
    my_ids = list(range(rank, len(ds), world))
    pad_to = int(model.max_seq_len)
    n_written = 0
    with open(manifest_path, "w") as mf:
        for i0 in range(0, len(my_ids), args.batch_size):
            ids = my_ids[i0 : i0 + args.batch_size]
            samples = [ds[i] for i in ids]
            lengths = [s.shape[0] for s in samples]
            x, mask = pad_batch(samples, pad_to=pad_to)
            z_e = bundle.encode_tokens(x, mask)            # [B, N, D]
            _z_q, idx = bundle.quantize(z_e)
            B = len(ids)
            if Q > 1:
                # level-major [Q*B*N] -> per-sample token-major [N*Q]
                idx = np.asarray(idx).reshape(Q, B, n_tokens)
                idx = np.transpose(idx, (1, 2, 0)).reshape(B, -1)
            else:
                idx = np.asarray(idx).reshape(B, n_tokens)
            for bi, sid in enumerate(ids):
                name = os.path.splitext(
                    os.path.basename(ds.file_paths[sid]))[0]
                np.save(os.path.join(out, "indices", f"{name}.npy"),
                        idx[bi].astype(np.int32))
                rec = {"name": name, "source": ds.file_paths[sid],
                       "length": int(lengths[bi]),
                       "indices_path": f"indices/{name}.npy",
                       "n_tokens": n_tokens, "num_quantizers": Q}
                if args.save_latents:
                    np.save(os.path.join(out, "latents", f"{name}.npy"),
                            z_e[bi].astype(np.float32))
                    rec["latents_path"] = f"latents/{name}.npy"
                if args.save_geometry:
                    geo = token_geometry(samples[bi], n_tokens)
                    np.save(os.path.join(out, "geometry", f"{name}.npy"),
                            geo)
                    rec["geometry_path"] = f"geometry/{name}.npy"
                mf.write(json.dumps(rec) + "\n")
                n_written += 1
            print(f"[rank {rank}] {min(i0 + args.batch_size, len(my_ids))}"
                  f"/{len(my_ids)}", flush=True)

    # all ranks must finish writing before rank 0 merges (the reference
    # used dist.barrier(), :561; the jax equivalent is a global sync)
    if world > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("extract_code_indices_done")

    # rank-0 manifest merge (multi-host: all ranks share the filesystem)
    if rank == 0:
        meta = {
            "config": os.path.abspath(args.config),
            "ckpt": os.path.abspath(args.ckpt),
            "ckpt_sha256": (sha256_of_dir(args.ckpt)
                            if os.path.isdir(args.ckpt) else ""),
            "num_quantizers": Q, "codes_per_level": int(model.codebook_size),
            "code_dim": bundle.code_dim, "latent_tokens": n_tokens,
            "world_size": world,
        }
        with open(os.path.join(out, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        merged = os.path.join(out, "manifest.jsonl")
        with open(merged, "w") as outf:
            for r in range(world):
                p = os.path.join(out, f"manifest_rank{r}.jsonl")
                if os.path.exists(p):
                    outf.write(open(p).read())
        print(f"[done] rank 0 merged manifests -> {merged}")
    print(f"[done] rank {rank}: wrote {n_written} samples")


if __name__ == "__main__":
    main()
