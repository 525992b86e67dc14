"""opentransformer_tpu — a TPU-native end-to-end speech recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
ZhengkunTian/OpenTransformer (see SURVEY.md): Speech-Transformer and Conformer
encoders with an attention decoder, hybrid CTC training, RNN/Transformer
language models, kaldi-compatible online fbank, SpecAugment, length bucketing,
label smoothing with tied embeddings, mesh-parallel training (dp/tp), and
fully on-device batch beam search with incremental KV caching.

External contracts preserved from the reference:
  * YAML config with ``data`` / ``model`` / ``train`` sections
  * vocab file format (``unit idx`` lines) and special ids
    PAD=BLK=0, BOS=EOS=1 (``<S/E>``), UNK=2
  * ``wav.scp``/kaldi-ark/espnet-json dataset formats
"""

__version__ = "0.1.0"
