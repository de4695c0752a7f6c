"""The TPU engine: streaming host pipeline + batched device programs.

Orchestration parity with the reference (main.py:52-154,156-309) but
batched and device-resident:

  stream records ──► eligible reads buffered as code arrays
     └─ step-1 batches [B, 2, no_bp] ──► device greedy counts
         └─ host f64 TRC selection (argmax / tie / strict cutoff —
            reference float semantics, allsteps.py:178-198)
  subset FASTQ/FASTA written once per file (resume artifact,
  main.py:64-87) — but step 2 uses the in-memory tail slices, never
  re-parsing the subset file (the reference's O(K^2) re-parse,
  allsteps.py:252-258, is deliberately not replicated)
  step-2 batches [B, L] ──► device window counts + exact changepoint
  CSV rows appended in input-read order after each device batch
  aggregation/quadfit on host f64 (aggregate.py)

CSV rows, subset files, and aggregate log lines are bit-compatible with
the reference (tested against the demo goldens).
"""

from __future__ import annotations

import dataclasses
import os
import zlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from topsicle_tpu import aggregate
from topsicle_tpu.config import TopsicleConfig
from topsicle_tpu.io import batch as batching
from topsicle_tpu.io import reader, writer
from topsicle_tpu.kmers import patterns_to_search
from topsicle_tpu.oracle.reference import ReadResult


@dataclasses.dataclass
class _Passer:
    order: int
    read_id: str
    kmer: str
    tail: str
    trc: float
    tail_codes: np.ndarray       # step-2 scan slice (already oriented)
    seq_len: int


class JaxEngine:
    """Single-host engine; multi-chip sharding is layered on by
    parallel.sharding.ShardedModel when more than one device is
    visible."""

    def __init__(self, cfg: TopsicleConfig, log: Optional[writer.RunLog] = None):
        cfg.validate()
        self.cfg = cfg
        self.log = log or writer.RunLog(cfg.output_dir if cfg.output_dir else None, echo=False)
        self._models: Dict[int, object] = {}

    # -- model cache -------------------------------------------------------
    def _model(self, phrase: int, kmers: Sequence[str]):
        if phrase not in self._models:
            import jax

            from topsicle_tpu.models import TelomereScanModel

            model = TelomereScanModel(
                kmers,
                window_size=self.cfg.window_size,
                slide=self.cfg.slide_value(),
                use_pallas=self.cfg.use_pallas,
            )
            n_dev = len(jax.devices())
            if n_dev > 1:
                from topsicle_tpu.parallel import ShardedScanModel, data_mesh

                # round the batch up to a mesh multiple so shards stay equal
                if self.cfg.batch_size % n_dev:
                    self.cfg.batch_size += n_dev - self.cfg.batch_size % n_dev
                model = ShardedScanModel(model, mesh=data_mesh(n_dev))
            self._warmup(model)
            self._models[phrase] = model
        return self._models[phrase]

    def _warmup(self, model) -> None:
        """Dispatch dummy production-shaped batches through both device
        stages, asynchronously (no result sync).  Remote TPU toolchains
        (e.g. a tunneled compile service) charge seconds..minutes per
        new program at its first execution; dispatching at model
        creation lets that cost overlap host parsing and the other
        stage's compile instead of stalling the first real batch.
        Failures are ignored — the real launch surfaces them."""
        cfg = self.cfg
        B = cfg.batch_size
        try:
            ends = np.zeros((B, 2, cfg.no_bp), np.uint8)     # all-'A', clean
            ends_len = np.full(B, cfg.no_bp, np.int32)
            futs = [model.step1_counts_launch(ends, ends_len)]
            L = cfg.static_scan_length()
            if L is not None:
                tails = np.zeros((B, L), np.uint8)
                lens = np.full(B, L, np.int32)
                nw = batching.window_counts_for_lengths(
                    lens, cfg.window_size, cfg.slide_value())
                futs.append(model.step2_boundary_launch(tails, nw, lens))
            # hold references so the dispatched computations aren't
            # dropped; the run's own batches queue behind them, so no
            # explicit sync is ever needed
            self._warm_futs = futs
        except Exception:
            pass

    # -- step 1 ------------------------------------------------------------
    def _select_hits(self, counts: np.ndarray, kmers: Sequence[str], cutoff: float
                     ) -> List[Optional[Tuple[str, str, float]]]:
        """Host-side f64 TRC selection from device counts [B, 2, K]:
        per-end argmax (first of equals in table order), forward only on
        strict '>', keep on strict TRC > cutoff."""
        ratio = self.cfg.no_bp / len(self.cfg.pattern)
        # vectorized over the batch; numpy argmax = first-of-equals in
        # table order, matching Python max() (allsteps.py:190-193)
        js = np.argmax(counts[:, 0, :], axis=1)
        je = np.argmax(counts[:, 1, :], axis=1)
        b = np.arange(counts.shape[0])
        trc_s = counts[b, 0, js].astype(np.float64) / ratio
        trc_e = counts[b, 1, je].astype(np.float64) / ratio
        fwd = trc_s > trc_e
        out: List[Optional[Tuple[str, str, float]]] = []
        for i in range(counts.shape[0]):
            if fwd[i]:
                out.append((kmers[js[i]], "forward", float(trc_s[i]))
                           if trc_s[i] > cutoff else None)
            else:
                out.append((kmers[je[i]], "reverse", float(trc_e[i]))
                           if trc_e[i] > cutoff else None)
        return out

    def _use_native(self) -> bool:
        if self.cfg.native_io is False:
            return False
        try:
            from topsicle_tpu.native import native_available
        except Exception:
            return False
        ok = native_available()
        if self.cfg.native_io is True and not ok:
            raise RuntimeError("native_io requested but the C++ IO library is unavailable")
        return ok

    def _iter_eligible(self, path: str):
        """(read_id, codes) for reads with len > minSeqLength, via the
        C++ loader when available (gzip inflate + parse + encode in one
        native pass), else the pure-Python reader.  Read-level failures
        (truncated gzip, malformed records) surface as InputFileError so
        the run can skip the file instead of dying."""
        cfg = self.cfg
        try:
            if self._use_native():
                from topsicle_tpu.native import NativeReader

                yield from NativeReader(path, cfg.min_seq_length)
                return
            for rec in reader.parse_records(path):
                if len(rec.seq) > cfg.min_seq_length:
                    yield rec.id, batching.encode_read(rec.seq)
        except (OSError, EOFError, UnicodeDecodeError, ValueError, MemoryError,
                zlib.error) as e:
            raise reader.InputFileError(path, e) from e

    def _read_source(self, path: str):
        """Eager background parse/encode of one file, bounded by ~2
        batches of reads (utils.prefetch.Prefetcher starts immediately,
        so sources created one file ahead overlap the previous file's
        device work — the reference's --threads fan-out, as read-ahead)."""
        from topsicle_tpu.utils.prefetch import Prefetcher

        return Prefetcher(self._iter_eligible(path), depth=2 * self.cfg.batch_size)

    def _step1_file(self, path: str, kmers: Sequence[str], model,
                    source=None) -> List[_Passer]:
        """Streaming step 1 with batches kept in flight: the device
        computes batch i while the host parses/encodes batch i+1."""
        cfg = self.cfg
        cutoff = cfg.min_cutoff()
        B = cfg.batch_size
        depth = 2
        passers: List[_Passer] = []
        buf: List[Tuple[int, str, np.ndarray]] = []
        pending = []  # [(rows, device_counts)]

        def drain_one():
            rows, fut = pending.pop(0)
            counts = np.asarray(fut)[: len(rows)]
            for (order, rid, codes), hit in zip(rows, self._select_hits(counts, kmers, cutoff)):
                if hit is not None:
                    km, tail, trc = hit
                    passers.append(
                        _Passer(
                            order, rid, km, tail, trc,
                            batching.extract_tail(codes, tail, cfg.trimfirst, cfg.maxlengthtelo),
                            len(codes),
                        )
                    )

        def flush():
            if not buf:
                return
            n = len(buf)
            ends = batching.ends_batch([c for _, _, c in buf], cfg.no_bp)
            ends_len = np.zeros(B, np.int32)
            ends_len[:n] = [min(len(c), cfg.no_bp) for _, _, c in buf]
            if n < B:  # pad to the static batch shape
                pad = np.full((B - n, 2, cfg.no_bp), 0xFF, np.uint8)
                ends = np.concatenate([ends, pad], axis=0)
            pending.append((list(buf), model.step1_counts_launch(ends, ends_len)))
            buf.clear()
            if len(pending) > depth:
                drain_one()

        # parse/encode ahead on a reader thread (bounded by ~2 batches)
        if source is None:
            source = self._read_source(path)
        for order, (rid, codes) in enumerate(source):
            buf.append((order, rid, codes))
            if len(buf) >= B:
                flush()
        flush()
        while pending:
            drain_one()
        return passers

    # -- subset emission ---------------------------------------------------
    def _write_subset(self, path: str, hit_ids: set) -> None:
        cfg = self.cfg
        out_path = writer.subset_path(cfg.output_dir, path, cfg.min_cutoff())
        if os.path.exists(out_path):
            self.log(f"Temporary fasta file already exists: {out_path}. Using existing file.")
            return
        fmt = reader.extension_format(path)
        # write to a temp name + atomic rename: a failed/killed write must
        # not leave a truncated subset that a later k / --resume would
        # silently reuse as complete (the exists-check above)
        tmp_path = out_path + ".tmp"
        try:
            if self._use_native():
                from topsicle_tpu.native import write_subset_native

                write_subset_native(path, tmp_path, sorted(hit_ids), fmt == "fastq")
            else:
                with open(tmp_path, "w") as fh:
                    for rec in reader.parse_records(path):
                        if rec.id in hit_ids:
                            writer.write_record(fh, rec, fmt)
            os.replace(tmp_path, out_path)
        except (OSError, EOFError, UnicodeDecodeError, ValueError, zlib.error) as e:
            if os.path.exists(tmp_path):
                try:
                    os.remove(tmp_path)
                except OSError:
                    pass
            raise reader.InputFileError(path, e) from e
        self.log(f"Temporary fasta file with TRC more than {cfg.min_cutoff()}:", out_path)

    # -- step 2 ------------------------------------------------------------
    def _step2_batches(self, passers: List[_Passer], model):
        """Yield (sub-list of passers, boundaries) in order, keeping up
        to 2 device batches in flight ahead of the consumer."""
        cfg = self.cfg
        B = cfg.batch_size
        depth = 2

        def launch(group):
            # "static" scan mode pads every batch to one L so the whole
            # run uses ONE compiled step-2 program (remote TPU compile
            # services charge seconds..minutes per new program shape)
            pad_len = cfg.static_scan_length() or max(
                len(p.tail_codes) for p in group)
            codes, lens = batching.tails_batch(
                [p.tail_codes for p in group], pad_len, cfg.length_bucket_quantum
            )
            if len(group) < B:
                pad = np.full((B - len(group), codes.shape[1]), 0xFF, np.uint8)
                codes = np.concatenate([codes, pad], axis=0)
                lens = np.concatenate([lens, np.zeros(B - len(group), np.int32)])
            n_windows = batching.window_counts_for_lengths(lens, cfg.window_size, cfg.slide_value())
            return model.step2_boundary_launch(codes, n_windows, lens)

        def consume(group, fut):
            t, has = (np.asarray(x) for x in fut)
            bounds = []
            for j, p in enumerate(group):
                maxc = min(cfg.maxlengthtelo, p.seq_len)
                b = int(cfg.trimfirst + cfg.slide_value() * int(t[j])) if has[j] else 0
                if b == 0 or b > maxc:
                    b = 0
                bounds.append(b)
            return group, bounds

        groups = [passers[i : i + B] for i in range(0, len(passers), B)]
        inflight = []
        for group in groups:
            inflight.append((group, launch(group)))
            if len(inflight) > depth:
                g, f = inflight.pop(0)
                yield consume(g, f)
        for g, f in inflight:
            yield consume(g, f)

    # -- optional per-read outputs (--plot / --rawcountpattern) ------------
    def _per_read_extras(self, group: List[_Passer], model, phrase: int,
                         bounds: List[int], image_start: int) -> None:
        cfg = self.cfg
        if not (cfg.plot or cfg.rawcountpattern):
            return
        B = cfg.batch_size
        pad_len = cfg.static_scan_length() or max(len(p.tail_codes) for p in group)
        codes, lens = batching.tails_batch(
            [p.tail_codes for p in group], pad_len, cfg.length_bucket_quantum
        )
        if len(group) < B:
            pad = np.full((B - len(group), codes.shape[1]), 0xFF, np.uint8)
            codes = np.concatenate([codes, pad], axis=0)
            lens = np.concatenate([lens, np.zeros(B - len(group), np.int32)])
        raw = model.rawcounts(codes)          # [B, K, W]
        n_windows = batching.window_counts_for_lengths(lens, cfg.window_size, cfg.slide_value())
        for j, p in enumerate(group):
            num = image_start + j
            nw = int(n_windows[j])
            counts = np.maximum(raw[j, :, :nw], 1)     # or-1 floor
            if cfg.rawcountpattern:
                self._write_rawcount(p, model, counts, phrase, num)
            if cfg.plot:
                from topsicle_tpu.plots import changepoint_plot

                starts = np.arange(nw) * cfg.slide_value() + cfg.trimfirst
                means = counts.sum(axis=0) / counts.shape[0]
                out = os.path.join(cfg.output_dir, f"plot_{phrase}_{num}.png")
                changepoint_plot(
                    starts, means, bounds[j], p.read_id, out,
                    xlim=cfg.rangecp or min(cfg.maxlengthtelo, p.seq_len),
                )

    def _write_rawcount(self, p: _Passer, model, counts: np.ndarray,
                        phrase: int, num: int) -> None:
        """rawcount_{phrase}_{num}.csv — pandas-style CSV with unlabeled
        index column; rows (tail, window start, kmer, count-or-1),
        window-major (allsteps.py:359-464, main.py:146-150)."""
        import csv as _csv

        path = os.path.join(self.cfg.output_dir, f"rawcount_{phrase}_{num}.csv")
        with open(path, "w", newline="") as fh:
            w = _csv.writer(fh)
            w.writerow(["", "tail", "position", "pattern", "count"])
            idx = 0
            nw = counts.shape[1]
            for wi in range(nw):
                for ki, km in enumerate(model.kmers):
                    w.writerow([idx, p.tail, wi * self.cfg.slide_value(), km, int(counts[ki, wi])])
                    idx += 1

    # -- global-mesh mode (--shardMode global) -----------------------------
    def _run_phrase_global(self, phrase: int, kmers: Sequence[str],
                           local_files, timers):
        """One telophrase in global-batch mode: every process contributes
        a B_local shard of each global batch; GSPMD spreads the scan over
        ALL chips of all hosts; results come back replicated and each
        process keeps rows for reads it contributed.  Lockstep is held by
        a per-batch OR-allgathered control word (has-data, needs-dense) —
        hosts whose streams run dry keep feeding empty shards until every
        stream is dry.  Per-read extras (--plot / --rawcountpattern) run
        locally per owned file, numbered in row order like files mode.
        Returns {file_idx: (label, [row, ...], [trc, ...], [telo, ...])}
        for this process, rows in input-read order per file."""
        import jax

        from topsicle_tpu.models.telomere import TelomereScanModel, _batch_is_clean
        from topsicle_tpu.parallel.multihost import (
            GlobalScanModel, or_across_processes)

        cfg = self.cfg
        cutoff = cfg.min_cutoff()
        n_local_dev = len(jax.local_devices())
        B_local = cfg.batch_size
        if B_local % n_local_dev:
            B_local += n_local_dev - B_local % n_local_dev
        base = TelomereScanModel(
            kmers, window_size=cfg.window_size, slide=cfg.slide_value())
        gmodel = GlobalScanModel(base)

        # static scan length => identical global shapes on every process
        # and one compile for the whole run
        L_static = max(
            cfg.length_bucket_quantum,
            -(-(cfg.maxlengthtelo - cfg.trimfirst) // cfg.length_bucket_quantum)
            * cfg.length_bucket_quantum,
        )

        def stream():
            for file_idx, path in local_files:
                try:
                    src = self._read_source(path)
                    try:
                        for order, (rid, codes) in enumerate(src):
                            yield file_idx, path, order, rid, codes
                    finally:
                        src.close()
                except reader.InputFileError as e:
                    self.log(f"ERROR: {e}; skipping this file")

        # ---- step 1, lockstep global batches -----------------------------
        it = stream()
        passers: List[Tuple[int, str, _Passer]] = []   # (file_idx, path, passer)
        exhausted = False
        while True:
            buf = []
            while len(buf) < B_local and not exhausted:
                try:
                    buf.append(next(it))
                except StopIteration:
                    exhausted = True
            ends = batching.ends_batch([c for *_, c in buf], cfg.no_bp)
            if len(buf) < B_local:
                pad = np.full((B_local - len(buf), 2, cfg.no_bp), 0xFF, np.uint8)
                ends = np.concatenate([ends, pad], axis=0) if len(buf) else \
                    np.full((B_local, 2, cfg.no_bp), 0xFF, np.uint8)
            ends_len = np.zeros(B_local, np.int32)
            ends_len[: len(buf)] = [min(len(c), cfg.no_bp) for *_, c in buf]
            clean = _batch_is_clean(
                ends.reshape(B_local * 2, -1), np.repeat(ends_len, 2))
            word = or_across_processes(np.array([len(buf) > 0, not clean]))
            if not word[0]:
                break
            counts = gmodel.step1_counts_global(ends, ends_len, dense=bool(word[1]))
            mine = gmodel.my_rows(counts, B_local)[: len(buf)]
            for (file_idx, path, order, rid, codes), hit in zip(
                    buf, self._select_hits(mine, kmers, cutoff)):
                if hit is not None:
                    km, tail, trc = hit
                    passers.append((file_idx, path, _Passer(
                        order, rid, km, tail, trc,
                        batching.extract_tail(codes, tail, cfg.trimfirst,
                                              cfg.maxlengthtelo),
                        len(codes),
                    )))

        # subset files (resume artifact) for this process's files
        by_file: Dict[int, List[Tuple[str, _Passer]]] = {}
        for file_idx, path, p in passers:
            by_file.setdefault(file_idx, []).append((path, p))
        for file_idx, path in local_files:
            entries = by_file.get(file_idx, [])
            try:
                self._write_subset(path, {p.read_id for _, p in entries})
            except reader.InputFileError as e:
                self.log(f"ERROR: {e}; subset not written")

        # ---- step 2, lockstep global batches -----------------------------
        rows: Dict[int, tuple] = {}   # file_idx -> (label, rows, trcs, telos)
        extras: Dict[int, list] = {}  # file_idx -> [(passer, bound), ...]
        want_extras = cfg.plot or cfg.rawcountpattern
        pos = 0
        while True:
            group = passers[pos : pos + B_local]
            pos += len(group)
            codes, lens = batching.tails_batch(
                [p.tail_codes for _, _, p in group], L_static,
                cfg.length_bucket_quantum)
            if codes.shape[1] != L_static:   # batch shorter than static L
                padc = np.full((codes.shape[0], L_static - codes.shape[1]),
                               0xFF, np.uint8)
                codes = np.concatenate([codes, padc], axis=1)
            if len(group) < B_local:
                pad = np.full((B_local - len(group), L_static), 0xFF, np.uint8)
                codes = np.concatenate([codes, pad], axis=0) if len(group) else \
                    np.full((B_local, L_static), 0xFF, np.uint8)
                lens = np.concatenate(
                    [lens, np.zeros(B_local - len(lens), np.int32)]) if len(group) \
                    else np.zeros(B_local, np.int32)
            n_windows = batching.window_counts_for_lengths(
                lens, cfg.window_size, cfg.slide_value())
            clean = _batch_is_clean(codes, lens)
            word = or_across_processes(np.array([len(group) > 0, not clean]))
            if not word[0]:
                break
            t, has = gmodel.step2_boundary_global(
                codes, n_windows, lens, dense=bool(word[1]))
            t_mine = gmodel.my_rows(t, B_local)
            has_mine = gmodel.my_rows(has, B_local)
            for j, (file_idx, path, p) in enumerate(group):
                maxc = min(cfg.maxlengthtelo, p.seq_len)
                b = int(cfg.trimfirst + cfg.slide_value() * int(t_mine[j])) \
                    if has_mine[j] else 0
                if b == 0 or b > maxc:
                    b = 0
                lbl = writer.file_label(path)
                entry = rows.setdefault(file_idx, (lbl, [], [], []))
                entry[1].append([lbl, phrase, f"{p.trc:.3f}", p.read_id, b])
                entry[2].append(float(p.trc))      # full precision for quadfit
                entry[3].append(float(b))
                if want_extras:
                    extras.setdefault(file_idx, []).append((p, b))
                timers.count(reads=1, bases=p.seq_len)

        # per-read extras on this process's own files: chunked like files
        # mode (image numbers 1..n per file, row order)
        if want_extras:
            Bc = cfg.batch_size
            for file_idx in sorted(extras):
                pairs = extras[file_idx]
                image_num = 1
                for s in range(0, len(pairs), Bc):
                    chunk = pairs[s : s + Bc]
                    self._per_read_extras(
                        [p for p, _ in chunk], base, phrase,
                        [b for _, b in chunk], image_num)
                    image_num += len(chunk)
        return rows

    def _emit_kept_unit(self, csv_path: str, lbl: str, phrase: int, path: str,
                        manifest, kept_rows: Dict[tuple, List[tuple]],
                        results: List[ReadResult],
                        phrase_to_telo: Dict[int, List[float]],
                        phrase_to_trc: Dict[int, List[float]]) -> None:
        """Re-emit a resume-completed unit's rows at its canonical
        phrase x file position (original trc strings, full-precision
        manifest TRCs for the aggregates) so a resumed run's CSV and
        aggregate lists are byte-identical to an uninterrupted run's.
        Pops the unit from kept_rows so a second same-label file never
        re-writes it."""
        unit_rows = kept_rows.pop((lbl, phrase), [])
        full_trcs = manifest.trcs_for(path, phrase)
        if full_trcs is not None and len(full_trcs) != len(unit_rows):
            full_trcs = None    # stale manifest payload
        for i, (rid, trc, telo) in enumerate(unit_rows):
            writer.append_csv_row_raw(csv_path, [lbl, phrase, trc, rid, telo])
            ftrc = full_trcs[i] if full_trcs is not None else float(trc)
            results.append(ReadResult(lbl, phrase, rid, ftrc, telo))
            phrase_to_telo.setdefault(phrase, []).append(float(telo))
            phrase_to_trc.setdefault(phrase, []).append(ftrc)

    # -- resume support ----------------------------------------------------
    def _prepare_resume(self, csv_path: str):
        """Load the manifest + existing CSV; keep rows belonging to
        completed (file, phrase) units, drop rows of interrupted units
        (they will be recomputed).  Kept rows are NOT written here —
        the run loop re-emits each unit's rows at its canonical position
        in the phrase x file iteration, so a resumed run's CSV is
        byte-identical to an uninterrupted run's (SURVEY.md §7.2.6
        deterministic global ordering).  Returns (manifest, kept_rows)
        where kept_rows maps (label, phrase) -> [(read_id, trc_str,
        telo)] in original CSV order."""
        import csv as _csv

        from topsicle_tpu.utils import RunManifest

        manifest = RunManifest(self.cfg.output_dir)
        done_labels = set()
        for phrase in self.cfg.telophrases():
            for path in self.cfg.input_paths():
                if manifest.is_done(path, phrase):
                    done_labels.add((writer.file_label(path), phrase))
        kept: Dict[tuple, List[tuple]] = {}
        if os.path.exists(csv_path):
            with open(csv_path, newline="") as fh:
                rows = list(_csv.reader(fh))
            body = [r for r in rows[1:] if len(r) == 5]
            for lbl, ph, trc, rid, telo in body:
                key = (lbl, int(ph))
                if key in done_labels:
                    kept.setdefault(key, []).append((rid, trc, int(telo)))
        writer.write_csv_header(csv_path)
        return manifest, kept

    # -- full run ----------------------------------------------------------
    def run(self) -> List[ReadResult]:
        from topsicle_tpu.utils import StageTimers, trace_context

        from topsicle_tpu.parallel import distributed as dist_mod

        cfg = self.cfg
        timers = StageTimers()
        os.makedirs(cfg.output_dir, exist_ok=True)
        csv_path = os.path.join(cfg.output_dir, "telolengths_all.csv")
        self.log(f"Output will be here: {csv_path}")

        pid, nproc = dist_mod.process_identity(cfg.process_id, cfg.process_count)
        dist = nproc > 1
        if dist and (cfg.resume or cfg.read_check is not None):
            raise ValueError("distributed runs do not support resume or read_check")
        if cfg.shard_mode == "global":
            if cfg.read_check is not None:
                # read_check is a single-read debug path; spinning up a
                # lockstep global mesh across hosts for one read is never
                # what the user wants — files mode covers it.
                raise ValueError(
                    "shardMode=global does not support read_check "
                    "(use shardMode=files)"
                )
            if dist:
                import jax

                if jax.process_count() != nproc:
                    raise ValueError(
                        "shardMode=global needs jax.distributed across all "
                        f"processes (jax sees {jax.process_count()} process(es), "
                        f"--processCount says {nproc}); pass --coordinator"
                    )
        if dist:
            # drop this process's stale done-marker/parts from any
            # crashed earlier run before new work begins (ownership-
            # scoped: concurrent fresh processes are never touched)
            dist_mod.reset_mine(cfg.output_dir, pid, nproc)

        manifest = None
        kept_rows: Dict[tuple, List[tuple]] = {}
        if cfg.resume:
            manifest, kept_rows = self._prepare_resume(csv_path)
        elif (not dist or pid == 0) and os.path.exists(csv_path) and os.path.getsize(csv_path) > 0:
            if cfg.override:
                self.log(f"Output file {csv_path} already exists; overwriting it (--override given).")
                os.remove(csv_path)
            else:
                raise FileExistsError(
                    f"Output file {csv_path} already exists and is not empty. "
                    "Use --override to force overwrite."
                )
        if not cfg.resume and (not dist or pid == 0):
            writer.write_csv_header(csv_path)
            from topsicle_tpu.utils import RunManifest

            manifest = RunManifest(cfg.output_dir)
            manifest.reset()

        results: List[ReadResult] = []
        phrase_to_telo: Dict[int, List[float]] = {}
        phrase_to_trc: Dict[int, List[float]] = {}

        all_files = list(enumerate(cfg.input_paths()))
        local_files = [(i, f) for i, f in all_files if not dist or i % nproc == pid]

        with trace_context(cfg.trace_dir):
            for phrase in cfg.telophrases():
                kmers = patterns_to_search(cfg.pattern, phrase)
                self.log("patterns to search:", kmers)
                if cfg.shard_mode == "global":
                    self.log("begin processing reads (global mesh)")
                    todo = local_files
                    if cfg.resume:
                        todo = [(i, p) for i, p in local_files
                                if not manifest.is_done(p, phrase)]
                    rows_by_file = self._run_phrase_global(
                        phrase, kmers, todo, timers)
                    # canonical file-index order: resume-completed units
                    # re-emit kept rows, computed units write + mark done
                    for file_idx, path in local_files:
                        lbl = writer.file_label(path)
                        if cfg.resume and manifest.is_done(path, phrase):
                            self.log(f"resume: skipping completed unit {path} (k={phrase})")
                            self._emit_kept_unit(csv_path, lbl, phrase, path,
                                                 manifest, kept_rows, results,
                                                 phrase_to_telo, phrase_to_trc)
                            continue
                        _, rws, f_trcs, f_telos = rows_by_file.get(
                            file_idx, (lbl, [], [], []))
                        if dist:
                            dist_mod.write_part(cfg.output_dir, phrase,
                                                file_idx, rws, f_trcs, f_telos)
                        else:
                            for r in rws:
                                writer.append_csv_row(
                                    csv_path, r[0], r[1], float(r[2]), r[3], r[4])
                        for r, ft in zip(rws, f_trcs):
                            results.append(ReadResult(lbl, phrase, r[3], ft, r[4]))
                        phrase_to_trc.setdefault(phrase, []).extend(f_trcs)
                        phrase_to_telo.setdefault(phrase, []).extend(f_telos)
                        if manifest is not None and not dist and cfg.read_check is None:
                            manifest.mark_done(path, phrase, len(rws), trcs=f_trcs)
                    continue

                model = self._model(phrase, kmers)
                self.log("begin processing reads")
                # Cross-file read-ahead: while file i drives the device, a
                # bounded reader thread parses/encodes file i+1.  This is
                # the TPU-native shape of the reference's fork pool over
                # files (main.py:232-235); --threads 1 disables it.
                lookahead = cfg.threads is None or cfg.threads >= 2
                todo = [p for _, p in local_files
                        if not (cfg.resume and manifest.is_done(p, phrase))]
                next_of = dict(zip(todo, todo[1:]))
                sources: Dict[str, object] = {}
                try:
                  for file_idx, path in local_files:
                    lbl = writer.file_label(path)
                    if cfg.resume and manifest.is_done(path, phrase):
                        self.log(f"resume: skipping completed unit {path} (k={phrase})")
                        self._emit_kept_unit(csv_path, lbl, phrase, path,
                                             manifest, kept_rows, results,
                                             phrase_to_telo, phrase_to_trc)
                        continue

                    src = sources.pop(path, None) or self._read_source(path)
                    nxt = next_of.get(path)
                    if lookahead and nxt is not None and nxt not in sources:
                        sources[nxt] = self._read_source(nxt)

                    self.log("subsetting raw dataset based on TRC cutoff")
                    try:
                        with timers.stage("step1"):
                            passers = self._step1_file(path, kmers, model, source=src)
                        with timers.stage("subset"):
                            self._write_subset(path, {p.read_id for p in passers})
                    except reader.InputFileError as e:
                        # One unreadable file must not kill a whole-genome
                        # run; its unit stays un-done so --resume retries it.
                        self.log(f"ERROR: {e}; skipping this file")
                        continue
                    finally:
                        src.close()

                    if cfg.read_check is not None:
                        self.log("checking specific read:", cfg.read_check)
                        sel = [p for p in passers if p.read_id == cfg.read_check]
                        if not sel:
                            raise ValueError(
                                f"read {cfg.read_check!r} did not pass the step-1 TRC filter "
                                "(the reference crashes on this combination; refusing clearly)"
                            )
                        self.log("step 2 on:", cfg.read_check)
                        passers = sel

                    image_num = 1
                    n_rows = 0
                    part_rows: List[list] = []
                    unit_trcs: List[float] = []
                    with timers.stage("step2"):
                        for group, bounds in self._step2_batches(passers, model):
                            for p, b in zip(group, bounds):
                                if dist:
                                    part_rows.append(
                                        [lbl, phrase, f"{p.trc:.3f}", p.read_id, b]
                                    )
                                else:
                                    writer.append_csv_row(csv_path, lbl, phrase, p.trc, p.read_id, b)
                                results.append(ReadResult(lbl, phrase, p.read_id, p.trc, b, p.kmer, p.tail))
                                phrase_to_telo.setdefault(phrase, []).append(float(b))
                                phrase_to_trc.setdefault(phrase, []).append(float(p.trc))
                                unit_trcs.append(float(p.trc))
                                timers.count(reads=1, bases=p.seq_len)
                                n_rows += 1
                            self._per_read_extras(group, model, phrase, bounds, image_num)
                            image_num += len(group)
                    if dist:
                        dist_mod.write_part(
                            cfg.output_dir, phrase, file_idx, part_rows,
                            phrase_to_trc.get(phrase, [])[-n_rows:] if n_rows else [],
                            phrase_to_telo.get(phrase, [])[-n_rows:] if n_rows else [],
                        )
                    elif manifest is not None and cfg.read_check is None:
                        manifest.mark_done(path, phrase, n_rows, trcs=unit_trcs)
                finally:
                    # abandoned read-ahead sources (read_check abort, a
                    # raised error) must not leave workers blocked on
                    # full queues holding file handles
                    for s_ in sources.values():
                        s_.close()
                self.log("finished processing all reads")
        self.log(timers.summary())

        if dist:
            dist_mod.mark_done(cfg.output_dir, pid, nproc)
            dist_mod.barrier()
            if pid != 0:
                return results
            run_parts = dist_mod.wait_all(cfg.output_dir, nproc)
            phrase_to_trc, phrase_to_telo = dist_mod.merge(
                cfg.output_dir, csv_path, run_parts
            )
            dist_mod.cleanup_parts(cfg.output_dir)

        # The reference always saves the quadfit plot when >=3 points
        # (main.py:270-273) — not gated on --plot.
        def plot_factory(phrase):
            def fn(trc, telo, vx, vy, coeffs):
                try:
                    from topsicle_tpu.plots import quadfit_plot

                    out = os.path.join(cfg.output_dir, f"quadfit_{phrase}mer_{cfg.pattern}.png")
                    quadfit_plot(trc, telo, vx, vy, coeffs, out)
                except Exception as e:  # plotting must never kill a run
                    self.log(f"quadfit plot failed: {e}")
            return fn

        aggregate.summarize_all(
            phrase_to_trc, phrase_to_telo, cfg.input_trc(),
            log=self.log, plot_fn_for_phrase=plot_factory,
        )
        self.log("All telomere found, have a nice day.")
        return results


def make_engine(cfg: TopsicleConfig, log: Optional[writer.RunLog] = None):
    """Engine factory honoring cfg.engine ('jax' | 'oracle')."""
    if cfg.engine == "oracle":
        from topsicle_tpu.oracle import OracleEngine

        return OracleEngine(cfg, log=log)
    return JaxEngine(cfg, log=log)
