"""ImageReportModel — the joint image-report tower (reference
``mutual_info_img_txt/model.py:529-595``).

Wraps the ResNet image encoder and the TextBert text encoder; ``__call__``
returns ``(embedding_img, embedding_txt, logits_img, logits_txt)`` with the
same semantics as the reference forward (model.py:540-555): embedding_img
is the ResNet 768-d pooled feature (5-tuple slot 1) and embedding_txt is
the BERT pooled-[CLS] output.

Checkpoint naming contracts (``pytorch_MI_image_model.bin``,
``pytorch_MI_text_model.bin``, ``pytorch_model_epoch<N>.bin``) are handled
by mimm_tpu.checkpoint exporters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .bert import BertConfig, TextBert
from .resnet import ResNet256_6_2_1


class ImageReportModel(nn.Module):
    bert_config: BertConfig
    output_channels: int = 1
    dtype: Any = jnp.float32
    # stem compute-schedule knobs (same function/params; models/resnet.py)
    # — safe to toggle between runs.
    s2d_stem: bool = False
    pallas_stem: bool = False
    # sequence-parallel activation sharding for the text tower
    # (parallel/mesh.py seq_sharding); None = no constraint.  Execution
    # knob only — params/checkpoints are identical either way.
    sp_sharding: Any = None
    # Cross-replica sync-BN axis for the image tower's BatchNorms: set to
    # the mesh 'data' axis when the step runs under shard_map (the
    # grad_allreduce_dtype path) so batch statistics stay GLOBAL-batch —
    # the same semantics the plain GSPMD step computes implicitly.
    # Params/checkpoints identical either way.
    bn_axis_name: Any = None

    def setup(self):
        self.image_model = ResNet256_6_2_1(output_channels=self.output_channels,
                                           dtype=self.dtype,
                                           s2d_stem=self.s2d_stem,
                                           pallas_stem=self.pallas_stem,
                                           bn_axis_name=self.bn_axis_name)
        self.text_model = TextBert(self.bert_config, dtype=self.dtype,
                                   sp_sharding=self.sp_sharding)

    def __call__(self, img, txt_ids, txt_masks=None, txt_segments=None,
                 *, train: bool = False):
        _, embedding_img, _, _, logits_img = self.image_model(img, train=train)
        embedding_txt, logits_txt = self.text_model(
            txt_ids, token_type_ids=txt_segments, attention_mask=txt_masks,
            deterministic=not train)
        return embedding_img, embedding_txt, logits_img, logits_txt
