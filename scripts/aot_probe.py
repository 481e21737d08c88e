"""AOT compile-only probes for the chained-loop programs.

The deep10m_r3m OOM dump (scripts/deep10m_r3m.log) shows the TPU backend
COPIES the big scan-invariant arrays (bf16 storage + f32 re-score
reference) into the while-loop carry: `copy.75 = copy(emb_ref.1)` 5.72 G
+ a 2.86/2.15 G compressed-remat pair for the storage — 10.7 G of HLO
temps at 12M rows, an HBM OOM. CPU XLA hoists the same program with zero
copies (/tmp/carry_copy_test.py), so this is TPU-while-allocation
behavior, probed here compile-only (no execution) via the remote
TpuAotCompiler.

The candidate fix is the standard jax training-loop idiom: DONATE the
arrays and return them as passthrough outputs so XLA aliases
param -> while buffer -> result instead of copying.
"""
import functools
import inspect

import jax

from pqvector_tpu.query import device as D

_RAW = D._masked_pallas_loop.__wrapped__
_SIG = inspect.signature(_RAW)


@functools.wraps(_RAW)
def _loop_passthrough(*args, **kw):
    """_masked_pallas_loop + the big arrays returned unchanged, so
    donation has matching outputs to alias into."""
    d, ids = _RAW(*args, **kw)
    b = _SIG.bind(*args, **kw)
    return d, ids, b.arguments["emb"], b.arguments["emb_sq"], \
        b.arguments.get("emb_ref")


_STATICS = D.MASKED_LOOP_STATICS  # single source of truth (device.py)

loop_plain = D._masked_pallas_loop
loop_donated = jax.jit(
    _loop_passthrough,
    static_argnames=_STATICS,
    donate_argnames=("emb", "emb_sq", "emb_ref"),
)


def compile_report(tag, jitted, args, kw):
    """Compile (never execute) and report memory + big-copy counts."""
    out = {"tag": tag}
    try:
        c = jitted.lower(*args, **kw).compile()
    except Exception as e:  # noqa: BLE001 — report compile failures
        out["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        return out
    try:
        ma = c.memory_analysis()
        out["temp_mb"] = round(ma.temp_size_in_bytes / 1e6, 1)
        out["arg_mb"] = round(ma.argument_size_in_bytes / 1e6, 1)
        out["alias_mb"] = round(ma.alias_size_in_bytes / 1e6, 1)
        out["gen_mb"] = round(ma.generated_code_size_in_bytes / 1e6, 1)
    except Exception as e:  # noqa: BLE001
        out["memory_analysis"] = f"unavailable ({type(e).__name__})"
    try:
        n_rows = str(int(args[6].shape[0]))  # emb row count
        big_copies = [
            line.strip()[:140]
            for line in c.as_text().splitlines()
            if " copy(" in line and n_rows in line
        ]
        out["big_copies"] = len(big_copies)
        out["copy_lines"] = big_copies[:6]
    except Exception as e:  # noqa: BLE001
        out["hlo_text"] = f"unavailable ({type(e).__name__})"
    return out


def probe_loop(searcher, q, k, nprobe, reps, mode, donated=False,
               defer=None):
    """Compile the production search_loop binding; report, don't run.

    ``defer`` mirrors search_loop's deferred-re-score decision (None =
    the searcher's own policy, as production would resolve it)."""
    k_s = searcher._spill_k(k)
    defer_k = 0
    if defer is None:
        defer = searcher._loop_defer_rescore()
    if defer:
        defer_k, k_s = k_s, min(2 * k_s, int(searcher.emb.shape[0]))
    args, kw = searcher._search_loop_binding(
        searcher._check_queries(q), k_s, nprobe, reps, mode
    )
    kw["defer_k"] = defer_k
    jitted = loop_donated if donated else loop_plain
    tag = f"{mode} reps={reps} B={q.shape[0]}" + (
        " DONATED" if donated else ""
    ) + (f" DEFER(k={defer_k})" if defer_k else "")
    return compile_report(tag, jitted, args, kw)
