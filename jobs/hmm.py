"""spark-submit job: HMM train / decode — the `mahout baumwelch` /

`mahout viterbi` CLI twins.

Reference: mr/.../sequencelearning/hmm/BaumWelchTrainer.java (options:
input sequence file, nrOfHiddenStates, nrOfObservedStates, epsilon,
maxIterations) and ViterbiEvaluator.java (model + observed sequence ->
hidden path).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/hmm.py train \
      --input events.parquet --output /tmp/hmm.json \
      --hidden-states 3 --observed-states 4 [--supervised]
      [--epsilon 1e-4] [--max-iterations 10]
  spark-submit ... jobs/hmm.py decode \
      --input seqs.parquet --model /tmp/hmm.json --output /tmp/paths
  spark-submit ... jobs/hmm.py predict \
      --model /tmp/hmm.json --output /tmp/seqs \
      --n-sequences 100 --length 20   # `mahout hmmpredict` twin

train input: supervised -> (seq_id, t, hidden, obs) event rows;
Baum-Welch -> (seq_id, obs array<int>) sequence rows (deterministic
uniform-ish init from the seed).
decode input: (seq_id, obs array<int>) rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["train", "decode", "predict"])
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", default=None,
                    help="model JSON (decode/predict)")
    ap.add_argument("--n-sequences", type=int, default=10,
                    help="predict: sequences to generate")
    ap.add_argument("--length", type=int, default=20,
                    help="predict: observations per sequence")
    ap.add_argument("--hidden-states", type=int, default=None)
    ap.add_argument("--observed-states", type=int, default=None)
    ap.add_argument("--supervised", action="store_true")
    ap.add_argument("--pseudo-count", type=float, default=1.0)
    ap.add_argument("--epsilon", type=float, default=1e-4)
    ap.add_argument("--max-iterations", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    import numpy as np

    from mahout_spark.operators.hmm import (HmmModel, baum_welch_frame,
                                            train_supervised_frame,
                                            viterbi_decode_frame)
    from mahout_spark.session import get_spark

    from mahout_spark.operators.hmm import generate_sequences_frame

    spark = get_spark("hmm", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    if args.mode == "predict":
        # `mahout hmmpredict` twin (RandomSequenceGenerator.java)
        if not args.model:
            ap.error("predict requires --model")
        with open(args.model) as f:
            model = HmmModel.from_json(f.read())
        out = generate_sequences_frame(spark, model, args.n_sequences,
                                       args.length, seed=args.seed)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"wall_s": round(time.time() - t0, 2),
                          "sequences": args.n_sequences,
                          "length": args.length}))
        spark.stop()
        return

    if not args.input:
        ap.error(f"{args.mode} requires --input")
    df = spark.read.parquet(args.input)

    if args.mode == "train":
        if not (args.hidden_states and args.observed_states):
            ap.error("train requires --hidden-states/--observed-states")
        h, o = args.hidden_states, args.observed_states
        if args.supervised:
            model = train_supervised_frame(
                df, h, o, pseudo_count=args.pseudo_count)
        else:
            # deterministic near-uniform init (BaumWelchTrainer uses a
            # random init; seeded here so reruns converge identically)
            rng = np.random.default_rng(args.seed)
            a = rng.uniform(0.9, 1.1, (h, h))
            b = rng.uniform(0.9, 1.1, (h, o))
            pi = rng.uniform(0.9, 1.1, h)
            init = HmmModel(a / a.sum(1, keepdims=True),
                            b / b.sum(1, keepdims=True), pi / pi.sum())
            model = baum_welch_frame(df, init, epsilon=args.epsilon,
                                     max_iterations=args.max_iterations)
        with open(args.output, "w") as f:
            f.write(model.to_json())
        print(json.dumps({"wall_s": round(time.time() - t0, 2),
                          "hidden": h, "observed": o,
                          "mode": ("supervised" if args.supervised
                                   else "baumwelch")}))
    else:
        if not args.model:
            ap.error("decode requires --model")
        with open(args.model) as f:
            model = HmmModel.from_json(f.read())
        out = viterbi_decode_frame(df, model)
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"wall_s": round(time.time() - t0, 2),
                          "sequences": n}))


if __name__ == "__main__":
    main()
