"""Speculative decoding: draft-model proposal + target verification.

Analog of common/speculative.cpp (common_speculative_gen_draft :185) and the
server's batch_spec path (server-context.cpp:2074+): a small draft model
proposes n tokens greedily; the target model scores all of them in ONE
batched step (that's the win: verification is a T=n+1 prefill, not n decode
steps); accepted prefix + one corrected token are kept, caches rolled back
to the accepted length.

Both contexts must share a vocabulary (the reference translates between
draft/target vocabs; we require identical vocab for now).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from rrs_tpu.runtime.context import InferenceContext


@dataclasses.dataclass
class SpecStats:
    n_drafted: int = 0
    n_accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.n_accepted / max(self.n_drafted, 1)


def generate_speculative(
    target: InferenceContext,
    draft: InferenceContext,
    prompt: list[int],
    max_new_tokens: int,
    n_draft: int = 4,
    stop_tokens: tuple[int, ...] = (),
) -> tuple[list[int], SpecStats]:
    """Greedy speculative generation. Returns (tokens, stats)."""
    stats = SpecStats()
    t_seq = target.new_sequence()
    d_seq = draft.new_sequence()

    t_logits = target.prefill(t_seq, prompt)
    draft.prefill(d_seq, prompt)
    out: list[int] = []
    last = int(np.argmax(t_logits[-1]))
    out.append(last)

    while len(out) < max_new_tokens and last not in stop_tokens:
        # 1) draft proposes n tokens greedily from its own cache
        proposal = []
        cur = last
        for _ in range(n_draft):
            dl = draft.decode({d_seq: cur})[d_seq]
            cur = int(np.argmax(dl))
            proposal.append(cur)
        stats.n_drafted += len(proposal)

        # 2) target verifies [last, p0, .., p_{n-1}] in one chunked step
        verify = [last] + proposal
        logits = target.prefill(t_seq, verify)     # [n+1, V]

        accepted = []
        for i, p in enumerate(proposal):
            want = int(np.argmax(logits[i]))
            if want == p:
                accepted.append(p)
            else:
                accepted.append(want)              # corrected token
                break
        else:
            # all accepted: also take the target's next token
            accepted.append(int(np.argmax(logits[len(proposal)])))
        stats.n_accepted += sum(
            1 for i, p in enumerate(proposal[: len(accepted)]) if accepted[i] == p
        )

        # 3) roll back caches: keep prompt + out + accepted[:-1] in the cache
        # (accepted[-1] is the next step's input, not yet fed anywhere)
        keep = len(prompt) + len(out) + len(accepted) - 1
        target.kv.seq_rm(t_seq, p0=keep)
        draft.kv.seq_rm(d_seq, p0=keep)

        for tok in accepted:
            out.append(tok)
            last = tok
            if last in stop_tokens or len(out) >= max_new_tokens:
                break

    target.kv.seq_rm(t_seq)
    draft.kv.seq_rm(d_seq)
    return out[:max_new_tokens], stats
