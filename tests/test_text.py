"""Text-branch tests: session assembly, prompts/privacy, BERT parity vs HF
torch, WordPiece vs HF tokenizer, classifier fit, summarization pipeline."""

import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.text import (
    BertConfigT,
    BertEncoder,
    TextClassifier,
    TextClassifierConfig,
    TextTrainer,
    WordPieceTokenizer,
    apply_sensitive_replacements,
    assemble_sessions,
    assessment_prompt,
    parse_path,
    port_hf_bert,
    summary_prompt,
)
from privacy_preserve_federated_asr_tpu.text.classifier import TextTrainerConfig
from privacy_preserve_federated_asr_tpu.text.summarize import (
    RAGSummarizer,
    SessionSummarizer,
    cosine_topk,
)


def test_parse_path_and_assemble_sessions():
    assert parse_path("S001_PAR_12_3400_5600.wav") == ("S001", "PAR", 12, 3400, 5600)
    assert parse_path("S002_INV_1.wav") == ("S002", "INV", 1, 0, 0)
    rows = [
        {"path": "S001_PAR_2_200_300.wav", "text": "second thing"},
        {"path": "S001_INV_1_0_100.wav", "text": "what do you see"},
        {"path": "S001_PAR_3_400_500.wav", "text": ""},
        {"path": "S002_PAR_1_0_50.wav", "text": "other session"},
    ]
    docs = assemble_sessions(rows)
    assert docs["S001"] == "INV: what do you see\nPAR: second thing"
    assert docs["S002"] == "PAR: other session"
    par_only = assemble_sessions(rows, roles=("PAR",), include_role_tag=False)
    assert par_only["S001"] == "second thing"


def test_sensitive_replacement_and_prompts(tmp_path):
    table = {"S001": {"MY NAME IS JOHN": "MY NAME IS [NAME]"}}
    out = apply_sensitive_replacements("S001", "PAR: MY NAME IS JOHN OK", table)
    assert out == "PAR: MY NAME IS [NAME] OK"
    # unknown session: unchanged
    assert apply_sensitive_replacements("S999", "TEXT", table) == "TEXT"

    p = summary_prompt("INV: hi\nPAR: the boy is stealing cookies")
    assert "anomia" in p and "PAR: the boy" in p
    assert "present" in assessment_prompt("PAR: text").lower()

    import json
    from privacy_preserve_federated_asr_tpu.text.prompts import load_sensitive_dict

    f = tmp_path / "sens.json"
    f.write_text(json.dumps(table))
    loaded = load_sensitive_dict(str(f))
    assert loaded["S001"]


def test_sensitive_replacement_reference_shape(tmp_path):
    """Round-trip the reference's native Sensitive_replace_dict shape:
    {session: ordered [(original, replacement), ...]} applied as sequential
    str.replace (reference centralized/prompts.py:2-21 builds the dict,
    0207_DM_Extact_dataAugmentation.py:105-108 applies it). Fixture content
    is synthetic — the reference's actual rewrites are dataset-derived
    privacy data and are deliberately not shipped."""
    import json

    from privacy_preserve_federated_asr_tpu.text.prompts import (
        SENSITIVE_REPLACE_DICT,
        load_sensitive_dict,
    )

    # built exactly the way the reference builds it: zip(ori_lst, rep_lst)
    ori_lst = [
        ["S900", "PAR: THAT IS A WAY TO GET HURT"],
        ["S900", "PAR: GET HURT I SHOULD SAY"],
        ["S901", "PAR: THE GIRL SEES THE BOY FALL"],
    ]
    rep_lst = [
        ["S900", "PAR: THAT COULD BE UNSAFE"],
        ["S900", "PAR: BE UNSAFE I SHOULD SAY"],
        ["S901", "PAR: THE GIRL NOTICES THE BOY ACCIDENTALLY FALLING"],
    ]
    table = {}
    for ori_item, rep_item in zip(ori_lst, rep_lst):
        table.setdefault(ori_item[0], []).append((ori_item[1], rep_item[1]))

    doc = "INV: TELL ME\nPAR: THAT IS A WAY TO GET HURT\nPAR: GET HURT I SHOULD SAY"
    out = apply_sensitive_replacements("S900", doc, table)
    # the reference's loop-of-replace semantics: first pair rewrites line 2
    # AND the prefix of line 3, then the second pair cleans up the remainder
    expected = doc
    for o, r in table["S900"]:
        expected = expected.replace(o, r)
    assert out == expected
    assert "GET HURT" not in out and "UNSAFE" in out
    # unknown session: unchanged; list shape via JSON sidecar round-trips
    assert apply_sensitive_replacements("S777", doc, table) == doc
    f = tmp_path / "sens_ref.json"
    f.write_text(json.dumps(table))
    loaded = load_sensitive_dict(str(f))
    assert apply_sensitive_replacements("S901", "PAR: THE GIRL SEES THE BOY FALL") \
        == "PAR: THE GIRL NOTICES THE BOY ACCIDENTALLY FALLING"
    SENSITIVE_REPLACE_DICT.clear()


def test_bert_parity_vs_hf_torch():
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfigT.tiny_for_tests()
    hf_cfg = BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg)
    hf.eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), dtype=np.int32)
    mask[1, 8:] = 0
    with torch.no_grad():
        out = hf(torch.tensor(ids.astype(np.int64)),
                 attention_mask=torch.tensor(mask.astype(np.int64)))

    params = port_hf_bert(hf.state_dict(), cfg)
    enc = BertEncoder(cfg)
    hidden, pooled = enc.apply({"params": params}, ids, mask)
    # compare valid positions
    np.testing.assert_allclose(np.asarray(hidden)[0],
                               out.last_hidden_state[0].numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hidden)[1, :8],
                               out.last_hidden_state[1, :8].numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(), rtol=2e-4, atol=2e-5)


def test_wordpiece_matches_hf(tmp_path):
    from transformers import BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "boy", "is", "steal",
             "##ing", "cook", "##ies", "a", "b", "##c"]
    f = tmp_path / "vocab.txt"
    f.write_text("\n".join(vocab) + "\n")
    hf = BertTokenizer(str(f), do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(str(f))
    for text in ["the boy is stealing cookies", "abc the zzz", "A BOY"]:
        theirs = hf(text).input_ids
        got, mask = ours.encode(text)
        assert got == theirs, text
        assert mask == [1] * len(got)


def test_text_classifier_learns_and_regression():
    rng = np.random.default_rng(0)
    x0 = rng.normal(-1, 0.3, size=(40, 16)).astype(np.float32)
    x1 = rng.normal(1, 0.3, size=(40, 16)).astype(np.float32)
    x = np.concatenate([x0, x1])
    y = np.concatenate([np.zeros(40), np.ones(40)]).astype(np.int32)

    cfg = TextClassifierConfig(embed_dim=16, hidden_dim=16)
    tr = TextTrainer(cfg, TextTrainerConfig(num_epochs=20, batch_size=8,
                                            learning_rate=1e-2))
    result = tr.fit(x, y, x, y)
    assert tr.evaluate(x, y)["acc"] > 0.9

    # MMSE regression twin
    reg = TextTrainer(cfg.replace(regression=True),
                      TextTrainerConfig(num_epochs=30, batch_size=8,
                                        learning_rate=1e-2))
    y_mmse = x[:, 0].astype(np.float32) * 3 + 20
    reg.fit(x, y_mmse, x, y_mmse)
    assert reg.evaluate(x, y_mmse)["mse"] < 5.0


def test_multi_input_fusion_shapes():
    import jax

    for fusion in ("concat", "attention"):
        cfg = TextClassifierConfig(embed_dim=8, hidden_dim=8, num_inputs=3,
                                   fusion=fusion)
        m = TextClassifier(cfg)
        x = np.zeros((4, 3, 8), dtype=np.float32)
        params = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x)["params"]
        out = m.apply({"params": params}, x)
        assert out.shape == (4, 2)


def test_summarizers():
    doc = ("INV: what is happening\n"
           "PAR: the boy is on the stool stealing cookies from the jar\n"
           "PAR: water is overflowing in the sink")
    s = SessionSummarizer()  # offline extractive fallback
    out = s.summarize("S001", doc)
    assert "cookies" in out

    calls = []
    def fake_llm(prompt):
        calls.append(prompt)
        return "The participant shows mild word-finding difficulty."
    s2 = SessionSummarizer(llm_fn=fake_llm,
                           sensitive_table={"S001": {"cookies": "[FOOD]"}})
    out2 = s2.summarize("S001", doc)
    assert out2.startswith("The participant")
    assert "[FOOD]" in calls[0] and "cookies" not in calls[0]  # privacy applied

    # RAG retrieval
    def embed(texts):
        return np.asarray([[len(t), t.count("a"), 1.0] for t in texts], dtype=np.float32)
    rag = RAGSummarizer(llm_fn=fake_llm, embed_fn=embed,
                        corpus_texts=["aaa", "bbbbbbbb"], corpus_summaries=["s1", "s2"],
                        k=1)
    rag.summarize("S009", "aa a")
    assert "s1" in calls[-1] or "s2" in calls[-1]
    assert cosine_topk(np.array([1.0, 0.0]), np.array([[1.0, 0.0], [0.0, 1.0]]), 1) == [0]


def test_session_augmenter():
    from privacy_preserve_federated_asr_tpu.text.augment import SessionAugmenter

    docs = {"S001": "INV: hi\nPAR: the boy JOHN takes cookies\nPAR: water spills"}
    labels = {"S001": 1}
    calls = []

    def llm(prompt):
        calls.append(prompt)
        return "INV: hello\nPAR: a boy grabs biscuits\nPAR: the tap overflows"

    aug = SessionAugmenter(llm_fn=llm,
                           sensitive_table={"S001": {"JOHN": "[NAME]"}})
    out_docs, out_labels, failures = aug.augment_sessions(docs, labels, k=2)
    assert set(out_docs) == {"S001_aug0", "S001_aug1"}
    assert out_labels["S001_aug0"] == 1 and not failures
    assert "JOHN" not in calls[0] and "[NAME]" in calls[0]

    # offline fallback keeps content label-preserving
    off_docs, off_labels, _ = SessionAugmenter().augment_sessions(docs, labels, k=1)
    assert "cookies" in off_docs["S001_aug0"]

    # failing llm is recorded, not raised
    bad = SessionAugmenter(llm_fn=lambda p: 1 / 0)
    _, _, fails = bad.augment_sessions(docs, labels, k=1)
    assert fails == ["S001"]


def test_embed_sessions_batches_and_pads():
    import jax
    from privacy_preserve_federated_asr_tpu.text.bert import (
        BertConfigT, BertEncoder, WordPieceTokenizer)
    from privacy_preserve_federated_asr_tpu.text.classifier import embed_sessions

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "boy", "runs", "a"]
    tok = WordPieceTokenizer({t: i for i, t in enumerate(vocab)})
    cfg = BertConfigT.tiny_for_tests().replace(vocab_size=len(vocab))
    enc = BertEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      np.zeros((1, 4), np.int32))["params"]

    texts = ["the boy runs", "a", "the boy runs the boy runs"]
    out = embed_sessions(
        lambda ids, mask: enc.apply({"params": params}, ids, mask)[1],
        tok, texts, batch_size=2)
    assert out.shape == (3, cfg.hidden_size)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# LLM client adapter vs a local stub server (no egress needed)
# ---------------------------------------------------------------------------

class _StubOpenAI:
    """Minimal OpenAI/Azure-schema HTTP endpoint for unit tests: records
    requests, can fail the first N calls with 429 to exercise retries."""

    def __init__(self, fail_first=0):
        import http.server
        import threading

        stub = self
        stub.requests = []
        stub.fail_remaining = fail_first

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                import json as _json
                body = _json.loads(
                    self.rfile.read(int(self.headers["Content-Length"])))
                stub.requests.append(
                    {"path": self.path, "body": body,
                     "headers": {k.lower(): v for k, v in self.headers.items()}})
                if stub.fail_remaining > 0:
                    stub.fail_remaining -= 1
                    self.send_response(429)
                    self.send_header("Retry-After", "0")
                    self.end_headers()
                    return
                if "embeddings" in self.path:
                    data = [{"index": i, "embedding": [float(len(t)), 1.0]}
                            for i, t in enumerate(body["input"])]
                    out = {"data": data}
                else:
                    last = body["messages"][-1]["content"]
                    out = {"choices": [{"message": {
                        "role": "assistant",
                        "content": f"SUMMARY({len(body['messages'])}): {last[:20]}"}}]}
                payload = _json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()


def test_llm_client_azure_schema_and_few_shot():
    from privacy_preserve_federated_asr_tpu.text import (
        LLMClientConfig, make_llm_fn)

    stub = _StubOpenAI()
    try:
        cfg = LLMClientConfig(
            endpoint=stub.url, api_key="k1", model="gpt4dep",
            api_type="azure", system_prompt="You are a psychologist.",
            few_shot=[("example in", "example out")], backoff=0.01)
        out = make_llm_fn(cfg)("PATIENT TRANSCRIPT")
        assert out.startswith("SUMMARY(4)")  # system + 2 few-shot + user
        req = stub.requests[-1]
        assert req["path"].startswith("/openai/deployments/gpt4dep/chat")
        assert "api-version=" in req["path"]
        assert req["headers"]["api-key"] == "k1"
        roles = [m["role"] for m in req["body"]["messages"]]
        assert roles == ["system", "user", "assistant", "user"]
    finally:
        stub.close()


def test_llm_client_openai_schema_retries_and_embeddings():
    import numpy as np
    import pytest as _pytest
    import urllib.error

    from privacy_preserve_federated_asr_tpu.text import (
        LLMClientConfig, make_embed_fn, make_llm_fn)

    stub = _StubOpenAI(fail_first=2)
    try:
        cfg = LLMClientConfig(endpoint=stub.url, api_key="sk", model="gpt-4o",
                              api_type="openai", max_retries=3, backoff=0.01)
        out = make_llm_fn(cfg)("hello")
        assert "hello" in out and len(stub.requests) == 3  # 2 x 429 + success
        req = stub.requests[-1]
        assert req["path"] == "/v1/chat/completions"
        assert req["headers"]["authorization"] == "Bearer sk"
        assert req["body"]["model"] == "gpt-4o"

        emb = make_embed_fn(cfg)(["a", "abc"])
        assert emb.shape == (2, 2) and emb.dtype == np.float32
        np.testing.assert_allclose(emb[:, 0], [1.0, 3.0])

        # retries exhausted -> the HTTP error surfaces
        stub.fail_remaining = 99
        bad = LLMClientConfig(endpoint=stub.url, api_key="sk",
                              api_type="openai", max_retries=1, backoff=0.01)
        with _pytest.raises(urllib.error.HTTPError):
            make_llm_fn(bad)("x")
    finally:
        stub.close()


def test_llm_client_plugs_into_summarizers():
    """End-to-end: the HTTP client works as SessionSummarizer.llm_fn and
    RAGSummarizer.embed_fn/llm_fn by config alone (VERDICT Next #7)."""
    from privacy_preserve_federated_asr_tpu.text import LLMClientConfig, make_embed_fn, make_llm_fn
    from privacy_preserve_federated_asr_tpu.text.summarize import (
        RAGSummarizer, SessionSummarizer)

    stub = _StubOpenAI()
    try:
        cfg = LLMClientConfig(endpoint=stub.url, api_key="k", api_type="openai",
                              backoff=0.01)
        s = SessionSummarizer(llm_fn=make_llm_fn(cfg))
        out = s.summarize("S001", "THE DOG SAT ON THE MAT")
        assert out.startswith("SUMMARY")

        rag = RAGSummarizer(
            llm_fn=make_llm_fn(cfg), embed_fn=make_embed_fn(cfg),
            corpus_texts=["ref one", "ref two longer"],
            corpus_summaries=["sum1", "sum2"], k=1)
        out2 = rag.summarize("S002", "ANOTHER SESSION")
        assert out2.startswith("SUMMARY")
        # the RAG prompt carried a retrieved few-shot transcript
        chat_reqs = [r for r in stub.requests if "chat" in r["path"]]
        assert "Transcript:" in chat_reqs[-1]["body"]["messages"][-1]["content"]
    finally:
        stub.close()


# ---------------------------------------------------------------------------
# 0207_DM_* experiment registry
# ---------------------------------------------------------------------------

def _synthetic_rows(n=24, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    words = ["THE", "DOG", "SAT", "CAT", "RAN", "HOME", "BLUE", "SKY"]
    rows = []
    for i in range(n):
        spk = f"S{i % 6:03d}"
        text = " ".join(rng.choice(words, size=rng.integers(3, 8)))
        rows.append({"path": f"{spk}_PAR_{i}_0.wav", "text": text,
                     "pred_str": text, "dementia_labels": i % 2})
    return rows


def test_experiment_registry_covers_reference_scripts():
    """Every reference 0207_DM_* driver has a registry entry whose `ref`
    names it (17 scripts; 1input also carries its regression twin)."""
    from privacy_preserve_federated_asr_tpu.text import EXPERIMENTS

    refs = {e.ref for e in EXPERIMENTS.values()}
    expected = {
        "0207_DM_Extact_dataAugmentation.py",
        "0207_DM_SentenceLvl1input.py",
        "0207_DM_SentenceLvl1input_ParamTuning.py",
        "0207_DM_SentenceLvl2inputHeterogeneous.py",
        "0207_DM_SentenceLvl2inputHeterogeneous_attentionFuse.py",
        "0207_DM_SentenceLvl2inputHomogeneous.py",
        "0207_DM_SentenceLvl3inputHeterogeneous.py",
        "0207_DM_SentenceLvlRAGSummary.py",
        "0207_DM_SentenceLvlmulti.py",
        "0207_DM_SentenceLvltext.py",
        "0207_DM_SessionLvl1input.py",
        "0207_DM_SessionLvl1input_consistencyTest.py",
        "0207_DM_SessionLvl2inputHomogeneous.py",
        "0207_DM_SessionLvlSimilarityEmb.py",
        "0207_DM_SessionLvlSummary.py",
        "0207_DM_SessionLvltext.py",
        "0207_DM_SessionLvltext_aug.py",
        "0207_DM_SessionLvltextnSummary.py",
    }
    assert refs == expected
    assert len(EXPERIMENTS) >= 17


def test_experiment_model_shape_parity():
    """Fused widths match the reference models: concat head = sum of input
    dims (SentenceLvl2inputHeterogeneous: 768+768; SimilarityEmb:
    t+t+Semb), attention fuse = 2 x alignhiddensize=128."""
    import jax
    import jax.numpy as jnp

    from privacy_preserve_federated_asr_tpu.text import EXPERIMENTS
    from privacy_preserve_federated_asr_tpu.text.classifier import TextClassifier

    def head_in_width(name):
        spec = EXPERIMENTS[name]
        cfg = spec.classifier_config()
        model = TextClassifier(cfg)
        width = sum(i.dim for i in spec.inputs)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, width)))["params"]
        return cfg, params["pooler"]["kernel"].shape[0]

    cfg, w = head_in_width("sentence_2input_homogeneous")
    assert w == 768 + 1280
    cfg, w = head_in_width("session_similarity_emb")
    assert w == 768 + 768 + 768
    cfg, w = head_in_width("sentence_2input_heterogeneous_attention_fuse")
    assert w == 2 * cfg.align_dim == 256
    cfg, w = head_in_width("sentence_3input_heterogeneous")
    assert w == 768 + 768 + 512


@pytest.mark.parametrize("name", sorted(
    __import__("privacy_preserve_federated_asr_tpu.text",
               fromlist=["EXPERIMENTS"]).EXPERIMENTS))
def test_experiment_runs_end_to_end(name):
    from privacy_preserve_federated_asr_tpu.text.classifier import TextTrainerConfig
    from privacy_preserve_federated_asr_tpu.text.experiments import run_experiment

    out = run_experiment(
        name, _synthetic_rows(24, seed=0), _synthetic_rows(12, seed=1),
        tcfg=TextTrainerConfig(num_epochs=2, batch_size=4),
        summaries={}, seeds=(0, 1))
    assert out, name
    if name == "extract_data_augmentation":
        assert out["n_train"] > 0
    elif "regression" in name:
        assert "mse" in out
    else:
        assert 0.0 <= out["acc"] <= 1.0
    if "consistency" in name:
        assert "acc_spread" in out
    if "param_tuning" in name:
        assert "lr" in out and "hidden_dim" in out
