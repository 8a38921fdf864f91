"""Write a self-contained byte-level tokenizer into a checkpoint dir.

Zero-egress boxes have no pretrained tokenizer files, which blocks every
text-in surface (serve chat completions, chat TUI, reasoning harness) even
though the models themselves run fine on random weights. A byte-level BPE
with no merges is a real, reversible tokenizer over 256 byte symbols +
specials — ids stay far below any model's vocab, decode(encode(x)) == x,
and AutoTokenizer loads it like any HF checkpoint. With it, the serving
stack and the reasoning-protocol harness can be driven end to end on this
box (VERDICT r3 item 6).

Usage: python scripts/make_byte_tokenizer.py <checkpoint_dir>
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def make_byte_tokenizer(out_dir: str | Path) -> None:
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # byte-level alphabet (the GPT-2 printable remapping) with no merges:
    # every text encodes to its bytes, one token per byte
    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {tok: i for i, tok in enumerate(sorted(alphabet))}
    for sp in ("<|endoftext|>", "<|im_start|>", "<|im_end|>"):
        vocab[sp] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.save(str(out_dir / "tokenizer.json"))
    (out_dir / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<|endoftext|>",
        "eos_token": "<|im_end|>",
        "additional_special_tokens": ["<|im_start|>", "<|im_end|>"],
        "chat_template": (
            "{% for message in messages %}"
            "{{ '<|im_start|>' + message['role'] + '\n' + message['content']"
            " + '<|im_end|>' + '\n' }}"
            "{% endfor %}"
            "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
            "{% endif %}"
        ),
    }, indent=1))


if __name__ == "__main__":
    make_byte_tokenizer(sys.argv[1])
    from transformers import AutoTokenizer

    t = AutoTokenizer.from_pretrained(sys.argv[1])
    s = "Hello, TPU world! éè"
    ids = t.encode(s)
    assert t.decode(ids) == s, (s, t.decode(ids))
    msg = t.apply_chat_template(
        [{"role": "user", "content": "hi"}], tokenize=False,
        add_generation_prompt=True,
    )
    assert "<|im_start|>assistant" in msg
    print(f"byte tokenizer written to {sys.argv[1]} "
          f"(vocab {t.vocab_size}, round-trip ok)")
