"""Grounded PyTorch-A100 baseline model for the reference implementation.

The reference (leesihun/SimulGen-VAE) publishes no benchmark numbers
(BASELINE.md), so ``vs_baseline`` must come from a model with stated,
checkable inputs.  Round 1 used a single "60 TFLOP/s sustained" guess; this
replaces it with a per-op roofline of the reference's ACTUAL eager step
(``modules/train.py:118-177``) on an A100, deliberately GENEROUS to the
reference so the reported speedup is conservative:

* Hardware: A100-SXM4-80GB — 156 TFLOP/s TF32 peak, 19.5 TFLOP/s fp32,
  2039 GB/s HBM (the best GPU the reference README recommends).
* Numerics: the reference trains eager fp32 with no AMP ("Removed mixed
  precision", train.py:16); torch defaults give cuDNN convs TF32
  (``cudnn.allow_tf32=True``) and fp32 matmuls.
* Realized efficiency: 60% of TF32 peak for conv-as-GEMM (cuDNN on large
  1-D convs), 75% of HBM bandwidth for elementwise/norm traffic — both at
  the high end of what eager torch sustains.
* Eager execution: every op is a separate kernel that round-trips HBM;
  per-op time = max(compute, memory) + 5 us launch overhead.  No fusion
  (torch.compile is disabled: ``compile_model(mode='none')``, train.py:87).
* Per-step extras the reference really pays: spectral-norm re-materializes
  W/sigma for all ~310M kernel params every forward (torch pre-forward
  hook); the gradient norm is a Python loop with a ``.item()`` sync per
  parameter (train.py:156-161, ~60 round trips); AdamW is unfused fp32.

The op inventory is derived from the architecture exactly as built by
``modules/VAE_network.py`` for the small variant.  Backward = 2x forward
FLOPs and ~2x forward bytes (standard conv backward: dX + dW each cost one
forward's FLOPs).

Outputs: per-op table (``table()``), step time, samples/sec — used by
``bench.py`` to print ``vs_baseline`` and our MFU.  See BASELINE.md for the
published numbers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

# A100-SXM4-80GB
TF32_PEAK = 156e12     # TFLOP/s, conv path (cudnn.allow_tf32 default True)
FP32_PEAK = 19.5e12    # matmul path (matmul.allow_tf32 default False)
HBM_BW = 2039e9        # bytes/s
CONV_EFF = 0.60        # realized fraction of TF32 peak for big conv-GEMMs
BW_EFF = 0.75          # realized fraction of HBM bandwidth
LAUNCH_S = 5e-6        # per-kernel launch/dispatch overhead, eager mode
ITEM_SYNC_S = 20e-6    # one .item() device sync (grad-norm Python loop)

# TPU peaks for the MFU line in bench.py
V5E_BF16_PEAK = 197e12
V4_BF16_PEAK = 275e12


@dataclass
class Op:
    name: str
    flops: float        # forward FLOPs
    bytes_rw: float     # forward HBM bytes (read+write)
    compute_peak: float = TF32_PEAK * CONV_EFF
    in_backward: bool = True  # contributes 2x flops / 2x bytes to backward

    def fwd_time(self) -> float:
        return max(self.flops / self.compute_peak,
                   self.bytes_rw / (HBM_BW * BW_EFF)) + LAUNCH_S

    def bwd_time(self) -> float:
        if not self.in_backward:
            return 0.0
        return max(2 * self.flops / self.compute_peak,
                   2 * self.bytes_rw / (HBM_BW * BW_EFF)) + 2 * LAUNCH_S


def _conv(name, b, t, cin, cout, k, extra_io=0.0) -> Op:
    flops = 2.0 * b * t * cin * cout * k
    bytes_rw = 4.0 * (b * t * cin + k * cin * cout + b * t * cout) + extra_io
    return Op(name, flops, bytes_rw)


def _eltwise(name, elems, passes=1.0, in_backward=True) -> Op:
    # bandwidth-bound: `passes` full read+write sweeps over `elems` fp32
    return Op(name, flops=elems, bytes_rw=8.0 * elems * passes,
              compute_peak=FP32_PEAK, in_backward=in_backward)


def reference_step_ops(batch=16, t=200, node=95008,
                       filters=(1024, 512, 256, 128),
                       z=32, hier=8, expansion=5) -> List[Op]:
    """Forward-pass op list of the reference VAE (small variant) plus the
    per-step training extras.  Architecture per modules/encoder.py:96-166,
    decoder.py:106-216, common.py:78-162."""
    ops: List[Op] = []
    f = list(filters)

    # ---- encoder ----
    chans = [node] + f
    for i in range(len(f)):
        cin, cout = chans[i], chans[i + 1]
        ops.append(_conv(f"enc{i} conv k=1 {cin}->{cout}", batch, t, cin, cout, 1))
        ops.append(_eltwise(f"enc{i} GN+GELU", batch * t * cout, passes=2))
        # EncoderResidualBlock (small): one k=3 conv + GN + GELU + residual
        ops.append(_conv(f"enc{i} res k=3 {cout}", batch, t, cout, cout, 3))
        ops.append(_eltwise(f"enc{i} res GN+GELU+add", batch * t * cout, passes=3))
        # per-level hier head: Linear (cout*t -> hier), fp32 matmul path
        ops.append(Op(f"enc{i} xs linear", 2.0 * batch * cout * t * hier,
                      4.0 * (batch * cout * t + cout * t * hier + batch * hier),
                      compute_peak=FP32_PEAK))
    ops.append(Op("enc final linear -> 2z",
                  2.0 * batch * f[-1] * t * 2 * z,
                  4.0 * (batch * f[-1] * t + f[-1] * t * 2 * z),
                  compute_peak=FP32_PEAK))

    # ---- decoder ----
    dec = f[::-1]
    ops.append(Op("dec z->z*t linear", 2.0 * batch * z * z * t,
                  4.0 * (batch * z + z * z * t + batch * z * t),
                  compute_peak=FP32_PEAK))
    ops.append(_conv("dec seq_start conv k=5", batch, t, z, dec[0], 5))
    # L-1 levels (decoder.py:170-216): block dec[i]->dec[i+1], residual at
    # dec[i+1], prior/posterior heads between levels
    for i in range(len(dec) - 1):
        cout = dec[i + 1]
        m = cout * expansion
        ops.append(_conv(f"dec{i} block k=3 {dec[i]}->{cout}",
                         batch, t, dec[i], cout, 3))
        ops.append(_eltwise(f"dec{i} block GELU", batch * t * cout))
        # DecoderResidualBlock small: k=1 expand, k=5, k=1 contract (+GN+GELU)
        ops.append(_conv(f"dec{i} res expand k=1 {cout}->{m}", batch, t, cout, m, 1))
        ops.append(_conv(f"dec{i} res k=5 {m}", batch, t, m, m, 5))
        ops.append(_conv(f"dec{i} res contract k=1 {m}->{cout}", batch, t, m, cout, 1))
        ops.append(_eltwise(f"dec{i} res GN+GELU x3 + add",
                            batch * t * (2 * m + cout), passes=2.5))
        if i < len(dec) - 2:
            nxt = cout
            # prior head condition_z: ResidualBlock + conv -> 2*nxt
            ops.append(_conv(f"dec{i} cond_z res k=3 {nxt}", batch, t, nxt, nxt, 3))
            ops.append(_conv(f"dec{i} cond_z out {nxt}->{2*nxt}", batch, t, nxt, 2 * nxt, 3))
            # hier injection linear + concat + condition_xz
            ops.append(Op(f"dec{i} xs inject linear", 2.0 * batch * hier * nxt * t,
                          4.0 * (batch * hier + hier * nxt * t),
                          compute_peak=FP32_PEAK))
            ops.append(_conv(f"dec{i} cond_xz res k=3 {2*nxt}", batch, t, 2 * nxt, 2 * nxt, 3))
            ops.append(_conv(f"dec{i} cond_xz out {2*nxt}->{2*nxt}", batch, t, 2 * nxt, 2 * nxt, 3))
            ops.append(_eltwise(f"dec{i} kl_2 + reparam", batch * t * 2 * nxt, passes=3))

    # readout chain over the full [B, T, node] map
    ops.append(_conv(f"readout k=1 {dec[-1]}->{node}", batch, t, dec[-1], node, 1))
    ops.append(_eltwise("recon GroupNorm(8)", batch * t * node, passes=2))
    ops.append(_eltwise("recon tanh", batch * t * node))
    ops.append(_eltwise("recon MSE + monitor MSE", batch * t * node, passes=2))

    # ---- per-step training extras (not 2x'd correctly by conv rule) ----
    n_kernel_params = _kernel_param_count(node, f, z, hier, t, expansion)
    # spectral norm pre-forward hook: power-iteration matvecs (2 reads) +
    # W/sigma materialization (read+write) in fp32, plus backward through
    # the normalization (read g + W, write dW)
    ops.append(Op("spectral norm (materialize W/sigma, fwd)",
                  2.0 * n_kernel_params,
                  4.0 * n_kernel_params * 4, compute_peak=FP32_PEAK,
                  in_backward=False))
    ops.append(Op("spectral norm (backward product rule)",
                  2.0 * n_kernel_params,
                  4.0 * n_kernel_params * 3, compute_peak=FP32_PEAK,
                  in_backward=False))
    # AdamW fp32: read p,m,v,g; write p,m,v
    ops.append(Op("AdamW (unfused, fp32)", 8.0 * n_kernel_params,
                  4.0 * n_kernel_params * 7, compute_peak=FP32_PEAK,
                  in_backward=False))
    return ops


def _kernel_param_count(node, f, z, hier, t, expansion) -> int:
    """Approximate total parameter count (dominant kernels)."""
    total = 0
    chans = [node] + list(f)
    for i in range(len(f)):
        cin, cout = chans[i], chans[i + 1]
        total += cin * cout + 3 * cout * cout + cout * t * hier
    total += f[-1] * t * 2 * z
    dec = list(f)[::-1]
    total += z * z * t + 5 * z * dec[0]
    for i in range(len(dec)):
        cout = dec[i]
        m = cout * expansion
        if i > 0:
            total += 3 * dec[i - 1] * cout
        total += cout * m + 5 * m * m + m * cout
        if i < len(dec) - 1:
            total += 3 * cout * cout + 3 * cout * 2 * cout
            total += hier * cout * t // t
            total += 3 * 2 * cout * 2 * cout * 2
    total += dec[-1] * node
    return int(total)


def step_time_s(batch=16, t=200, node=95008,
                filters=(1024, 512, 256, 128)) -> float:
    ops = reference_step_ops(batch, t, node, filters)
    fwd = sum(o.fwd_time() for o in ops)
    bwd = sum(o.bwd_time() for o in ops)
    # Python-loop grad norm: one .item() sync per parameter tensor (~60
    # kernels + ~60 host round trips, train.py:156-161)
    grad_norm = 60 * (ITEM_SYNC_S + LAUNCH_S)
    return fwd + bwd + grad_norm


def baseline_sps(batch=16, t=200, node=95008,
                 filters=(1024, 512, 256, 128)) -> float:
    """Estimated reference throughput (samples/sec) on one A100, eager."""
    return batch / step_time_s(batch, t, node, filters)


def model_flops_per_step(batch=16, t=200, node=95008,
                         filters=(1024, 512, 256, 128)) -> float:
    """fwd+bwd model FLOPs (3x forward; excludes SN/optimizer extras) —
    the numerator for the MFU line."""
    ops = reference_step_ops(batch, t, node, filters)
    fwd_model = sum(o.flops for o in ops if o.in_backward)
    return 3.0 * fwd_model


def table(batch=16, t=200, node=95008, filters=(1024, 512, 256, 128)) -> str:
    ops = reference_step_ops(batch, t, node, filters)
    lines = [f"{'op':44s} {'GFLOP':>9s} {'MB':>9s} {'fwd ms':>8s} {'bwd ms':>8s}"]
    for o in ops:
        lines.append(
            f"{o.name:44s} {o.flops/1e9:9.1f} {o.bytes_rw/1e6:9.1f} "
            f"{o.fwd_time()*1e3:8.3f} {o.bwd_time()*1e3:8.3f}"
        )
    st = step_time_s(batch, t, node, filters)
    lines.append(f"TOTAL step {st*1e3:.1f} ms -> {batch/st:.1f} samples/sec")
    return "\n".join(lines)


if __name__ == "__main__":
    print(table())
    print(f"\nmodel fwd+bwd FLOPs/step: {model_flops_per_step()/1e12:.2f} TFLOP")
    print(f"baseline samples/sec (A100, eager fp32/TF32): {baseline_sps():.1f}")
