#!/usr/bin/env python
"""Decode curves from discrete VQ code indices or continuous z_q latents.

Parity target: scripts/decode_with_vqvae.py — per manifest record, either
look up (and for RVQ, sum) code embeddings from the checkpointed codebook,
or decode a stored continuous latent tensor directly (reference :89-130).

Input manifest (jsonl) records need `indices_path` (token-major [N*Q])
or `latents_path` ([N, D]) plus `length`; `name` is optional.

Usage:
  python scripts/decode_with_vqvae.py --config configs/stage2_vq.yaml \
      --ckpt checkpoints/stage2_vq/last --manifest out/manifest.jsonl \
      --base_dir out --out_dir decoded [--from_latents]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def indices_to_zq(indices: np.ndarray, embedding: np.ndarray, n_tokens: int,
                  num_q: int, k_per: int) -> np.ndarray:
    """Token-major flat indices [N*Q] -> summed code vectors [N, D]."""
    idx = np.asarray(indices).reshape(n_tokens, num_q)
    z = np.zeros((n_tokens, embedding.shape[1]), np.float32)
    for q in range(num_q):
        gl = idx[:, q]
        if gl.max() < k_per and num_q > 1:
            gl = gl + q * k_per  # accept per-level indices too
        z += embedding[gl]
    return z


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--manifest", type=str, required=True)
    ap.add_argument("--base_dir", type=str, default="",
                    help="base dir for relative paths in the manifest")
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--from_latents", action="store_true",
                    help="decode stored z_e/z_q tensors instead of indices")
    ap.add_argument("--quantize_latents", action="store_true",
                    help="with --from_latents: pass z_e through the "
                         "quantizer before decoding")
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()

    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    model = bundle.model
    num_q = int(model.num_quantizers)
    k_per = int(model.codebook_size)
    n_tokens = bundle.latent_tokens
    emb = (np.asarray(bundle.vq_state.embedding)
           if bundle.vq_state is not None else None)

    records = [json.loads(line)
               for line in open(args.manifest) if line.strip()]
    os.makedirs(args.out_dir, exist_ok=True)
    out_manifest = os.path.join(args.out_dir, "manifest.jsonl")
    pad_to = int(model.max_seq_len)

    def load_rel(p):
        return np.load(os.path.join(args.base_dir, p) if args.base_dir
                       else p)

    with open(out_manifest, "w") as mf:
        for i0 in range(0, len(records), args.batch_size):
            chunk = records[i0 : i0 + args.batch_size]
            z_list, lens = [], []
            for rec in chunk:
                if args.from_latents:
                    z = np.asarray(load_rel(rec["latents_path"]), np.float32)
                    if args.quantize_latents:
                        z, _ = bundle.quantize(z[None])
                        z = z[0]
                else:
                    assert emb is not None, "model has no codebook"
                    z = indices_to_zq(load_rel(rec["indices_path"]), emb,
                                      n_tokens, num_q, k_per)
                z_list.append(z)
                lens.append(int(rec.get("length", pad_to)))
            zt = np.stack(z_list)
            curves = bundle.decode_curve6(zt, np.asarray(lens),
                                          pad_to=pad_to)
            for rec, c in zip(chunk, curves):
                name = rec.get("name", f"rec{i0:06d}")
                path = os.path.join(args.out_dir, f"{name}_decoded.npy")
                np.save(path, c, allow_pickle=False)
                mf.write(json.dumps({"name": name, "path": path,
                                     "length": int(c.shape[0])}) + "\n")
            print(f"[progress] {min(i0 + args.batch_size, len(records))}"
                  f"/{len(records)}", flush=True)
    print(f"[done] decoded {len(records)} records -> {args.out_dir}")


if __name__ == "__main__":
    main()
