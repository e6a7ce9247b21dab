"""attention_based_tbn_tpu — a TPU-native (JAX/Flax/pjit/Pallas) framework for
attention-based Temporal Binding Networks (TBN) on Epic-Kitchens-55.

Re-designed from scratch for TPU hardware with the same capability surface as
the reference PyTorch framework (tridivb/attention_based_tbn):

* TSN-style sync/async temporal segment sampling over RGB / Optical-Flow / Audio
* per-modality 2D-CNN towers (BN-Inception / ResNet / VGG), mid-level concat
  fusion, multi-head classification (verb/noun[/action]) and segment consensus
* a family of audio-attention mechanisms queried by the RGB feature
  (multi-headed / unimodal / prototype / fixed priors) with auxiliary
  prior-KL / contrast / entropy losses and epoch-gated decay
* training, evaluation, Epic-Kitchens challenge submission, visualization and
  offline preprocessing tooling

TPU-native design choices (vs. the reference):

* NHWC layouts, bfloat16 compute on the MXU, fp32 parameters/statistics
* the WAV->log-spectrogram transform runs as a fused XLA FFT on device
* one jitted SPMD train step over a ``jax.sharding.Mesh`` (data axis),
  gradient reduction rides ICI collectives inserted by XLA
* Pallas kernels for the attention-fusion and consensus/classifier hot paths
* host-side decode via a native C++ IO library (libjpeg / WAV) with a
  threaded prefetcher, instead of per-worker Python processes
"""

__version__ = "0.1.0"
