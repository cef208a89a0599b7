"""Attention-map collection (`config.visualization`).

The reference's attention classes return their probability tensors when
`config.visualization=True` (vilbert_k3m.py:423,466-475 self-attention,
:625-634 image, :826-838/:953-965 both co-attention variants), and the
encoder threads them out as three lists via `output_all_attention_masks`
(:1163-1329). The Flax-idiomatic equivalent: every attention site `sow`s
its post-dropout probs into the "intermediates" collection, and the caller
requests that collection as mutable. This module is the one-call wrapper.

Shapes: self-attention sites sow [B, H, Lq, Lq]; co-attention sites sow
"attn1" ([B, H, L2, L1] — stream2 queries over stream1 keys) and "attn2"
(the reverse), matching the reference's attn_data dict keys (:829-838).
Each sown entry is a tuple (one element per invocation of that module
instance within the forward — e.g. a text layer reused by several passes
accumulates one tensor per pass, in pass order).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple


def forward_with_attention(model, variables, *args, **kwargs
                           ) -> Tuple[Any, Dict]:
    """Run `model.apply` collecting attention maps.

    Requires `model.config.visualization` (raises otherwise — the flag must
    not be silently ignored in either direction). Returns
    (outputs, intermediates) where `intermediates` is the nested
    module-path dict of sown attention tensors.
    """
    cfg = getattr(model, "config", None)
    if cfg is None or not cfg.visualization:
        raise ValueError(
            "forward_with_attention requires config.visualization=True "
            "(no attention probs are sown otherwise)")
    out, mods = model.apply(variables, *args, mutable=["intermediates"],
                            **kwargs)
    return out, mods["intermediates"]


def flatten_attention(intermediates: Dict) -> Dict[str, Any]:
    """Nested intermediates -> {'path/to/site': probs} with tuple entries
    from repeated invocations expanded as '.../<i>'."""
    flat: Dict[str, Any] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            if len(node) == 1:
                flat["/".join(path)] = node[0]
            else:
                for i, v in enumerate(node):
                    flat["/".join(path + (str(i),))] = v
        else:
            flat["/".join(path)] = node

    rec(intermediates, ())
    return flat
