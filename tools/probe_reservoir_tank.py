"""Probe record: reservoir TANK banking strategies (measured NEGATIVE).

Context. `options.reservoir_depth` (shipped) extends a frame's main_data
back-reach from one slot to min(511, K slots) via a K-frame emission
delay, with FRONT-aligned placement for K>1 so naturally banked bytes
survive inside the buffered window. That alone is a zero-cost win where
natural banking exists (candidate-granularity slack): sparse-transient
content 20.2 -> 16.1 NMR at 96k, 12.0 -> 9.3 at 128k through libmpg123.

This probe asked whether ACTIVE banking (a `reservoir_tank` flag: coarsen
"donor" frames to fill the reservoir for upcoming attacks — lame's
reservoir strategy) buys more. Every formulation measured NEGATIVE on
alternating content and was removed (the full implementation lives in git
history, commit "reservoir_depth: K-frame emission delay ..."):

1. demand-gated donors ("donate when the frame's walk-start priced bits
   fit the slot"): NEVER FIRED — under the linbits law every frame's
   k=0 demand is 1.7-7x the slot at 64-128 kbps; nothing is "easy".
2. fixed fractional budget cut (-1/8) on all-LONG frames: TOOTHLESS —
   candidate spacing exceeds any fixed fraction whenever the selected
   candidate had slack, so the same candidate kept winning.
3. donors that still draw the reservoir: LEAK — the tank drains as fast
   as it fills (avail oscillated 20-120 bytes, reach never grew).
4. always-on no-draw donors + one-notch-coarser re-budget: tank fills,
   but steady classes pay 1.4-5 dB NMR (the no-draw/refill boundary
   oscillates around the target forever).
5. horizon-armed (starved transient arms a 24-frame donor window),
   unstarved transient DISARMS: the STOP frame right after an attack
   often affords its finest candidate and killed the horizon the SHORT
   frames had just armed — sparse win vanished.
6. horizon-armed with decay + donor-energy gate (donate only when >= 8x
   quieter than the arming attack): the honest best — sparse-transient
   -2.3 dB at 64k — but speech still regresses +1.7/+2.5..3.4 dB NMR at
   64/96k in EVERY variant: speech has no cheap frames (voiced frames
   are budget-bound and masked tightly; a one-notch donor tax is ~6 dB
   of donor noise for ~15% bits — a bad exchange rate unless the donor
   is near-silence).

Conclusion pinned: under the linbits law every frame is budget-bound, so
active donation always taxes a real frame, and the corpus says the tax
exceeds the attack-side gain everywhere except hand-built quiet-bed
content. The shipped zero-tax levers are reservoir_depth (placement
efficiency) and demand_budget (within-frame donation). The remaining
burst NMR gap vs lame is per-band distortion control (see
ARCHITECTURE.md "Burst-NMR attribution"), not temporal bit movement.

This script is a historical record; the reservoir_tank flag no longer
exists, so it does not run against HEAD. The measurement protocol it
used: synthetic corpus (tools/tune_psy.synth) + a sparse-transient class
(quiet 330 Hz bed, 300-sample noise hits every 8 frames), 16-24 x 1152
samples, mono 64/96/128 kbps, libmpg123 decode, interior-scored
masked_noise_ratio (drop 2 frames each end), A/B per class x bitrate.
"""

raise SystemExit(__doc__)
