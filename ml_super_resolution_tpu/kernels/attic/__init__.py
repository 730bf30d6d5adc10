"""Retired kernels, kept for the measured record.

espcn_fused2 (round 2): row-group reformulation of the fused ESPCN.
Measured on v5e (RESULTS.md): v2 3,575/3,879 MP/s (f32/bf16 operands) vs
v1 4,210 vs XLA-bf16 4,910 — the (G+2)/3x K-window FLOP waste cost more
than the MXU occupancy it bought.  Round-3 closure (VERDICT #4 decision
rule): a v3 was analyzed, not built — v1's remaining overhead is the
per-row panel-concat VMEM traffic, which is inherent to the
tap-concatenated formulation (the only Mosaic-legal one here: lane-dim
reshapes are unsupported and bf16 lane rolls crash the compiler — probed
2026-08-17), so the honest record is that XLA-bf16 wins the ESPCN
flagship and v1 stays as the opt-in --pallas route (beats XLA-f32).
"""
