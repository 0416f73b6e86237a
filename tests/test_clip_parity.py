"""Numerical parity for the CLIP text tower converter and golden BPE ids.

The reference conditions the SAG on frozen OpenAI CLIP ViT-B/32 text features
(/root/reference/scripts/model/motionclip.py:96-104, used at
test_LivelySpeaker_ted.py:85-87).  Real released weights are not available in
this environment, so we verify the *converter* the way the checkpoint would
exercise it: build a tiny torch module with CLIP's exact text-tower layout
(token/positional embeddings, ``nn.MultiheadAttention`` with packed
``in_proj_weight``, QuickGELU MLP, ``ln_final``, ``text_projection``; same
state_dict key names as the OpenAI release), round-trip its state_dict through
``clip_text_params_from_torch``, and require feature parity.

The tokenizer is verified against hand-computed byte-pair ids under the real
vocab layout (256 byte units, 256 ``</w>`` units, merges in file order, then
``<|startoftext|>``/``<|endoftext|>``) including framing and truncation at the
77-token context, mirroring ``clip.tokenize`` semantics.
"""

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from livelyspeaker_tpu.models.clip_text import (  # noqa: E402
    CLIPTextConfig,
    CLIPTextEncoder,
    clip_text_params_from_torch,
)
from livelyspeaker_tpu.data.clip_tokenizer import CLIPTokenizer  # noqa: E402

VOCAB, CTX, WIDTH, LAYERS, HEADS, EMBED = 100, 16, 64, 2, 4, 32


class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _ResBlock(nn.Module):
    """Mirror of CLIP's ResidualAttentionBlock (clip/model.py layout)."""

    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(
            OrderedDict(
                [
                    ("c_fc", nn.Linear(d, 4 * d)),
                    ("gelu", _QuickGELU()),
                    ("c_proj", nn.Linear(4 * d, d)),
                ]
            )
        )
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, attn_mask):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        return x + self.mlp(self.ln_2(x))


class _TinyTorchCLIPText(nn.Module):
    """CLIP text branch with the release's exact state_dict key names."""

    def __init__(self):
        super().__init__()
        self.token_embedding = nn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = nn.Parameter(torch.empty(CTX, WIDTH))
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [_ResBlock(WIDTH, HEADS) for _ in range(LAYERS)]
        )
        self.ln_final = nn.LayerNorm(WIDTH)
        self.text_projection = nn.Parameter(torch.empty(WIDTH, EMBED))
        nn.init.normal_(self.token_embedding.weight, std=0.02)
        nn.init.normal_(self.positional_embedding, std=0.01)
        nn.init.normal_(self.text_projection, std=WIDTH**-0.5)
        mask = torch.full((CTX, CTX), float("-inf"))
        mask.triu_(1)
        self.mask = mask

    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = x.permute(1, 0, 2)  # LND, as in CLIP
        for blk in self.transformer.resblocks:
            x = blk(x, self.mask)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return x @ self.text_projection


def test_clip_text_converter_matches_torch_clip_layout():
    torch.manual_seed(7)
    ref = _TinyTorchCLIPText().eval()

    # state_dict keys must be exactly the OpenAI release's text-branch names
    keys = set(ref.state_dict().keys())
    assert "token_embedding.weight" in keys
    assert "transformer.resblocks.0.attn.in_proj_weight" in keys
    assert "transformer.resblocks.1.mlp.c_fc.weight" in keys
    assert "text_projection" in keys

    rng = np.random.default_rng(11)
    tokens = rng.integers(1, VOCAB - 2, size=(3, CTX)).astype(np.int64)
    # plant an unambiguous EOT (per-row argmax) at varying positions
    for row, pos in enumerate([5, CTX - 1, 9]):
        tokens[row, pos] = VOCAB - 1

    with torch.no_grad():
        want = ref(torch.from_numpy(tokens)).numpy()

    cfg = CLIPTextConfig(
        vocab_size=VOCAB,
        context_length=CTX,
        width=WIDTH,
        layers=LAYERS,
        heads=HEADS,
        embed_dim=EMBED,
    )
    params = clip_text_params_from_torch(ref.state_dict(), layers=LAYERS)
    got = CLIPTextEncoder(cfg).apply(
        {"params": params}, jnp.asarray(tokens.astype(np.int32))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Golden BPE ids.  Vocab layout (matching clip/simple_tokenizer.py):
#   ids [0, 256)        byte units in bytes_to_unicode() order
#   ids [256, 512)      byte units + "</w>"
#   ids [512, 512+M)    merges in file order
#   sot = 512 + M, eot = 513 + M
# Printable ASCII starts at '!' (0x21) = id 0, so 'o' = 0x6F - 0x21 = 78 and
# "o</w>" = 256 + 78 = 334.
# ---------------------------------------------------------------------------

MERGES = ["h e", "l l", "he ll"]  # -> ids 512, 513, 514 ("he", "ll", "hell")
SOT, EOT = 515, 516
HELL, O_EOW, BANG_EOW = 514, 334, 256  # "hell", "o</w>", "!</w>"


@pytest.fixture()
def tok(tmp_path):
    p = tmp_path / "merges.txt"
    # no trailing newline: the real 16e6 file is longer than the slice bound
    # in CLIPTokenizer, but a trailing blank line in a short fixture would be
    # parsed as an (empty) merge and shift every id after the merge block
    p.write_text("#version: tiny-golden\n" + "\n".join(MERGES))
    return CLIPTokenizer(str(p))


def test_bpe_golden_ids_and_framing(tok):
    # "hello" -> h+e merges first (rank 0), l+l (rank 1), he+ll (rank 2),
    # leaving ("hell", "o</w>")
    ids = tok(["Hello"])
    assert ids.shape == (1, 77)
    assert ids[0, :4].tolist() == [SOT, HELL, O_EOW, EOT]
    assert not ids[0, 4:].any()


def test_bpe_cleaning_and_punctuation(tok):
    # html-unescape + whitespace collapse + lowercase, punctuation split off
    ids = tok(["  HeLLo\n\thello! "])
    assert ids[0, :6].tolist() == [SOT, HELL, O_EOW, HELL, O_EOW, BANG_EOW]
    assert ids[0, 6] == EOT


def test_bpe_truncation_at_context(tok):
    # clip.tokenize(truncate=True) semantics: cut to 77 and force EOT last
    ids = tok(["hello " * 100])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == SOT
    assert ids[0, 76] == EOT
    assert ids[0].min() > 0  # fully packed, no padding
    # body is the repeated word pair, uninterrupted
    assert ids[0, 1:75].tolist() == [HELL, O_EOW] * 37


def test_bpe_single_char_and_unmerged_word(tok):
    # "ha": no merge applies ('h'+'a</w>' is not in MERGES) -> byte ids
    h_id = ord("h") - ord("!")
    a_eow = 256 + (ord("a") - ord("!"))
    ids = tok(["ha"])
    assert ids[0, :4].tolist() == [SOT, h_id, a_eow, EOT]
