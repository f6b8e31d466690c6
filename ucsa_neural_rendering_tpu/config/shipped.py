"""Single source of truth for the SHIPPED NeRF configuration knobs that the
quality gate owns (PERFORMANCE.md "Render/encoding quality gate").

The gate's promotion follow-through updates this module plus the explicit
`nerf:` blocks in cfg/exp/{one_step_joint,multi_step,one_step_finetune_nerf}
(which mirror the reference's per-experiment YAML layout and therefore stay
explicit); bench.py's headline and __graft_entry__.entry() read the values
from here so the driver's artifacts always measure/compile the shipped
program (VERDICT r4 #8).

Reference surface being re-parameterized: the tcnn HashGrid config fixed at
16 levels x 2 features in network_tcnn_semantics.py:36-46.
"""

# encoding geometry (n_levels, n_features); the gate decision table lives in
# PERFORMANCE.md. 16x2 is the reference geometry / round-4 incumbent.
SHIPPED_NERF_ENC = (8, 4)

# forward estimator: False = exact trilinear, "face" = stratified
# face-sampled fine levels, True = fully stochastic (the accel ladder)
SHIPPED_NERF_SFWD = False

# train-time sample budget (occupancy-guided coarse + importance)
SHIPPED_TRAIN_BUDGET = (24, 8)

# coarse placement: False = binary occupancy weights, True = graded
# grid-density proposal placement (ops/renderer.py proposal_placement —
# lets the fine budget shrink; see the round-5 gate decision)
SHIPPED_PROPOSAL = True


def shipped_enc_str() -> str:
    return f"{SHIPPED_NERF_ENC[0]}x{SHIPPED_NERF_ENC[1]}"


def shipped_sfwd_env() -> str:
    """The bench.py BENCH_SFWD spelling of SHIPPED_NERF_SFWD."""
    return {False: "0", True: "1", "fine": "fine",
            "face": "face"}[SHIPPED_NERF_SFWD]
