"""Research kernels — measured retirements, kept OFF the serving tree.

Three Pallas kernels were built for this framework's hot ops and each
LOST its on-device A/B against plain XLA at every serving shape
(docs/PERFORMANCE.md, BENCH_DETAILS.json):

- :mod:`fbank_frames` — log-mel from materialized frames
  (13.9 vs XLA 6.8 ms / batch-1024);
- :mod:`fbank_wave` — log-mel from the hop-blocked waveform, framing
  never touches HBM (8.8 vs 6.8 ms);
- :mod:`topk_pallas` — fused cosine → window-max → per-block top-k
  identify scoring (2.3 vs 1.3 ms at (64, 10⁵); the serial per-block
  top-64 selection is the diagnosed bottleneck).

The post-mortem is the finding: at this framework's shapes (conv
towers, GEMM frontends, fused reductions at modest arithmetic
intensity) XLA's fusion machinery IS the performance path — it fuses
the window-max into the GEMM consumer and never materializes the score
matrix either.  The kernels stay here, tested (interpret-mode parity)
and benchmarked (evals/benchmark_frontend.py, evals/benchmark_topk.py,
re-runnable on new hardware via SDTK_TOPK_PALLAS=1), as the seam for
shapes where the trade flips — but the serving modules
(:mod:`..fbank`, :mod:`..topk`) carry none of their weight
(r4 VERDICT #8: "win the A/B or move them behind a research boundary").
"""
