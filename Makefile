# mmgclip_tpu developer targets

.PHONY: test test-fast test-smoke demo bench bench-train bench-report bench-text bench-serve dryrun reproduce eda

test:            ## full suite on the virtual 8-device CPU mesh (~14 min on 1 core)
	python -m pytest tests/ -q

test-fast:       ## fast tier gating commits
	python -m pytest tests/ -q -m 'not slow'

# pure-numpy/data/prompt/config suites, no jit-heavy work — the <5-minute
# pre-commit gate (the 20-minute fast tier remains the pre-push gate)
SMOKE = tests/test_config.py tests/test_data.py tests/test_prompts.py \
        tests/test_reports_pipeline.py tests/test_utils.py \
        tests/test_tokenizer_parity.py tests/test_compare_runs.py

test-smoke:      ## <5-minute smoke tier (pure-python suites)
	python -m pytest $(SMOKE) -q -m 'not slow'

demo:            ## reproducible end-to-end run -> outputs/demo/run/
	python tools/demo_run.py

bench:           ## encode throughput + FLOPs/MFU/H2D/v5e-projection accounting
	python bench.py

bench-train:     ## fused-epoch train-step samples/sec
	BENCH_MODE=train python bench.py

bench-report:    ## one-call cascade latency vs stepwise
	BENCH_MODE=report python bench.py

bench-text:      ## text-tower flash-vs-XLA attention A/B
	BENCH_MODE=text python bench.py

bench-serve:     ## serving latency + micro-batched throughput over TCP JSONL
	BENCH_MODE=serve python bench.py

bench-ingest:    ## north-star chain: native uint8 -> fused resize+window+encode
	BENCH_MODE=ingest python bench.py

dryrun:          ## multi-chip dryrun on a virtual 8-device CPU mesh (dp/tp/sp/pp/ep/zero1/multihost)
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

reproduce:       ## thesis-reproduction flow: convert -> encode -> train -> evaluate -> report
	python tools/reproduce.py $(ARGS)     # real artifacts: ARGS="--convnext X.pt --bert DIR ..."; offline rehearsal: ARGS=--fixtures

eda:             ## dataset statistics report (override paths with ARGS="key=value ...")
	python tools/eda.py --config-name train_binary_class_clf $(ARGS)
