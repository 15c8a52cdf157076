"""TPU-native privacy-preserving federated ASR framework (DACS).

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
JackingChen/Privacy-preserve-Federated-ASR: a self-supervised speech encoder
fine-tuned for CTC ASR with an AD-classification head and a "toggling
network" (arbitrator) that learns straight-through Gumbel-softmax channel
masks splitting the embedding into AD-free (ASR) and ASR-free (AD) streams,
trained centralized and federated (FedAvg over speaker-partitioned clients).

Design stance (TPU-first, not a port):
  * one model family (flax.linen) with pluggable SSL backbones,
  * losses and masks as pure functions fused into one XLA graph,
  * training stages as optimizer parameter-masks + loss weights
    (not requires_grad mutation),
  * federated clients as sharded state on a `jax.sharding.Mesh` axis with
    FedAvg as a weighted `psum` (not OS processes + filesystem checkpoints).
"""

__version__ = "0.1.0"
