"""MCP server end-to-end: spawn over stdio, JSON-RPC, sampling callbacks.

(Reference mechanism: tests/test_mcp_server.py spawns the real server as a
subprocess with a sampling callback.)
"""

import asyncio
import json
import os
import sys

import pytest

TESTDATA = os.path.join(os.path.dirname(__file__), "testdata")


class McpClient:
    """Tiny JSON-RPC stdio client that answers sampling requests."""

    def __init__(self, proc, sampling_responses):
        self.proc = proc
        self.sampling_responses = list(sampling_responses)
        self.sampling_requests = []
        self._next_id = 100

    async def _write(self, message):
        self.proc.stdin.write((json.dumps(message) + "\n").encode())
        await self.proc.stdin.drain()

    async def request(self, method, params=None, timeout=60):
        request_id = self._next_id
        self._next_id += 1
        await self._write(
            {"jsonrpc": "2.0", "id": request_id, "method": method, "params": params or {}}
        )
        # Read until we see the response, answering sampling requests inline.
        while True:
            line = await asyncio.wait_for(self.proc.stdout.readline(), timeout)
            assert line, "server closed stdout"
            message = json.loads(line)
            if message.get("method") == "sampling/createMessage":
                self.sampling_requests.append(message["params"])
                text = self.sampling_responses.pop(0)
                await self._write(
                    {
                        "jsonrpc": "2.0",
                        "id": message["id"],
                        "result": {
                            "role": "assistant",
                            "content": {"type": "text", "text": text},
                            "model": "fake",
                        },
                    }
                )
                continue
            if message.get("id") == request_id:
                return message


async def test_mcp_server_end_to_end(tmp_path):
    # Pre-build a conversation database offline.
    db = str(tmp_path / "mcp.db")
    env = dict(os.environ, TAT_JAX_PLATFORM="cpu")
    build = await asyncio.create_subprocess_exec(
        sys.executable,
        "-c",
        (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import asyncio;"
            "from typeagent_tpu.knowpro.convsettings import ConversationSettings;"
            "from typeagent_tpu.models.adapters import create_test_embedding_model;"
            "from typeagent_tpu.transcripts.transcript_ingest import ingest_vtt_transcript;"
            "s = ConversationSettings(model=create_test_embedding_model(16));"
            "s.semantic_ref_index_settings.auto_extract_knowledge = False;"
            f"t = asyncio.run(ingest_vtt_transcript({os.path.join(TESTDATA, 'mini.vtt')!r}, s, dbname={db!r}));"
        ),
        env=env,
    )
    assert await build.wait() == 0

    search_query = json.dumps(
        {
            "searchExpressions": [
                {
                    "rewrittenQuery": "What did Alice say?",
                    "filters": [{"searchTerms": ["Alice"]}],
                }
            ]
        }
    )
    answer = json.dumps({"type": "Answered", "answer": "Alice welcomed everyone."})

    proc = await asyncio.create_subprocess_exec(
        sys.executable,
        "-m",
        "typeagent_tpu.mcp.server",
        "--database",
        db,
        "--embedding-model",
        "test:16",
        stdin=asyncio.subprocess.PIPE,
        stdout=asyncio.subprocess.PIPE,
        env=env,
    )
    try:
        client = McpClient(proc, [search_query, answer])
        init = await client.request(
            "initialize",
            {"protocolVersion": "2024-11-05", "capabilities": {}, "clientInfo": {}},
        )
        assert init["result"]["serverInfo"]["name"] == "typeagent-tpu"

        tools = await client.request("tools/list")
        names = [t["name"] for t in tools["result"]["tools"]]
        assert names == ["query_conversation"]

        result = await client.request(
            "tools/call",
            {
                "name": "query_conversation",
                "arguments": {"question": "What did Alice say?"},
            },
            timeout=120,
        )
        content = result["result"]["content"][0]["text"]
        assert result["result"]["isError"] is False, content
        assert content == "Alice welcomed everyone."
        # Both pipeline stages sampled the client's LLM.
        assert len(client.sampling_requests) == 2

        # Resources: advertised, listable, readable.
        assert "resources" in init["result"]["capabilities"]
        resources = await client.request("resources/list")
        uris = [r["uri"] for r in resources["result"]["resources"]]
        assert uris == ["conversation://info", "conversation://messages/recent"]
        info = await client.request(
            "resources/read", {"uri": "conversation://info"}, timeout=120
        )
        payload = json.loads(info["result"]["contents"][0]["text"])
        assert payload["messages"] > 0
        recent = await client.request(
            "resources/read", {"uri": "conversation://messages/recent"}
        )
        assert "[" in recent["result"]["contents"][0]["text"]  # speaker tags
        missing = await client.request(
            "resources/read", {"uri": "conversation://nope"}
        )
        assert "error" in missing

        # Prompts: listable with arguments, instantiable.
        prompts = await client.request("prompts/list")
        names = {p["name"] for p in prompts["result"]["prompts"]}
        assert names == {"ask_conversation", "summarize_conversation"}
        got = await client.request(
            "prompts/get",
            {
                "name": "ask_conversation",
                "arguments": {"question": "Who spoke first?"},
            },
        )
        messages = got["result"]["messages"]
        assert messages[0]["role"] == "user"
        assert "Who spoke first?" in messages[0]["content"]["text"]

        # Error surface, same server session (a separate boot costs ~5 s):
        # unknown tool -> isError result; unknown method -> -32601; ping.
        result = await client.request("tools/call", {"name": "nope", "arguments": {}})
        assert result["result"]["isError"] is True
        result = await client.request("bogus/method")
        assert result["error"]["code"] == -32601
        result = await client.request("ping")
        assert result["result"] == {}
    finally:
        proc.stdin.close()
        await asyncio.wait_for(proc.wait(), 10)


# ---------------------------------------------------------------------------
# McpSamplingChatModel unit tests (no subprocess): role mapping + content
# formats. Reference parity: tests/test_mcp_server.py role-mapping matrix.
# ---------------------------------------------------------------------------


class FakeMcpServer:
    """Records create_message calls; returns a canned sampling result."""

    def __init__(self, result=None, raises=None):
        self.result = result or {"content": {"type": "text", "text": "canned"}}
        self.raises = raises
        self.calls = []

    async def create_message(self, messages, max_tokens):
        self.calls.append((messages, max_tokens))
        if self.raises:
            raise self.raises
        return self.result


def make_sampling_model(result=None, raises=None):
    from typeagent_tpu.mcp.server import McpSamplingChatModel

    server = FakeMcpServer(result=result, raises=raises)
    return McpSamplingChatModel(server), server


async def test_sampling_string_prompt_becomes_user_message():
    model, server = make_sampling_model()
    result = await model.complete("hello there")
    assert result.value == "canned"
    (messages, max_tokens), = server.calls
    assert messages == [
        {"role": "user", "content": {"type": "text", "text": "hello there"}}
    ]
    assert max_tokens == 4096


async def test_sampling_role_mapping_preserves_user_and_assistant():
    model, server = make_sampling_model()
    await model.complete(
        [
            {"role": "user", "content": "q1"},
            {"role": "assistant", "content": "a1"},
            {"role": "system", "content": "sys"},  # MCP sampling has no system
        ]
    )
    (messages, _), = server.calls
    assert [m["role"] for m in messages] == ["user", "assistant", "assistant"]
    assert [m["content"]["text"] for m in messages] == ["q1", "a1", "sys"]


async def test_sampling_exception_returns_failure():
    model, _ = make_sampling_model(raises=RuntimeError("boom"))
    result = await model.complete("x")
    from typeagent_tpu.models.result import Failure

    assert isinstance(result, Failure)
    assert "boom" in result.message


async def test_sampling_list_content_joined():
    model, _ = make_sampling_model(
        result={
            "content": [
                {"type": "text", "text": "part1"},
                {"type": "image", "data": "..."},
                {"type": "text", "text": "part2"},
            ]
        }
    )
    result = await model.complete("x")
    assert result.value == "part1\npart2"


async def test_sampling_list_without_text_items_fails():
    model, _ = make_sampling_model(
        result={"content": [{"type": "image", "data": "..."}]}
    )
    result = await model.complete("x")
    from typeagent_tpu.models.result import Failure

    assert isinstance(result, Failure)


async def test_sampling_unknown_content_type_fails():
    model, _ = make_sampling_model(result={"content": 42})
    result = await model.complete("x")
    from typeagent_tpu.models.result import Failure

    assert isinstance(result, Failure)


# ---------------------------------------------------------------------------
# Corpus mode: query_corpus tool over several conversation databases
# ---------------------------------------------------------------------------


class _CannedSamplingServer:
    """Stub McpServer: create_message pops canned client-LLM responses."""

    def __init__(self, responses):
        self.responses = list(responses)

    async def create_message(self, messages, max_tokens=0):
        return {"content": {"type": "text", "text": self.responses.pop(0)}}


async def test_mcp_query_corpus_tool(tmp_path):
    import argparse
    import json as _json

    from typeagent_tpu.knowpro.convsettings import ConversationSettings
    from typeagent_tpu.mcp import server as mcp_server
    from typeagent_tpu.models.adapters import create_test_embedding_model
    from typeagent_tpu.podcasts.podcast import Podcast, PodcastMessage
    from typeagent_tpu.knowpro.universal_message import ConversationMessageMeta
    from typeagent_tpu.storage.utils import create_storage_provider

    # Two SQLite conversations with distinct content.
    for name, text in (("alpha", "Bach wrote fugues"), ("beta", "budget meeting")):
        settings = ConversationSettings(model=create_test_embedding_model(8))
        settings.semantic_ref_index_settings.auto_extract_knowledge = False
        settings.storage_provider = await create_storage_provider(
            settings.message_text_index_settings,
            settings.related_term_index_settings,
            str(tmp_path / f"{name}.db"),
            PodcastMessage,
        )
        pod = await Podcast.create(settings, name=name)
        await pod.add_messages_with_indexing(
            [
                PodcastMessage(
                    [text],
                    ConversationMessageMeta("Speaker"),
                    timestamp="2024-01-01T10:00:00Z",
                )
            ]
        )
        await settings.storage_provider.close()

    args = argparse.Namespace(
        database=None,
        index_path=None,
        embedding_model="test:8",
        corpus=[
            f"alpha={tmp_path / 'alpha.db'}",
            str(tmp_path / "beta.db"),  # bare path -> stem name
        ],
    )
    server = mcp_server.build_server(args)
    assert "query_corpus" in server.tools

    stage1 = _json.dumps(
        {
            "searchExpressions": [
                {
                    "rewrittenQuery": "What about fugues?",
                    "filters": [{"searchTerms": ["fugues"]}],
                }
            ]
        }
    )
    answered = _json.dumps({"type": "Answered", "answer": "Fugues by Bach."})
    no_answer = _json.dumps({"type": "NoAnswer", "whyNoAnswer": "nothing"})
    # One stage-1 translation (shared) + one answer per conversation; a
    # single good answer needs no combine round.
    stub = _CannedSamplingServer([stage1, answered, no_answer])

    result = await server.tools["query_corpus"].handler(
        stub, question="What about fugues?"
    )
    assert "Fugues by Bach." in result
    assert "[alpha]" in result and "[beta]" in result
    assert "(no answer)" in result


async def test_mcp_server_corpus_end_to_end(tmp_path):
    """Subprocess server in --corpus mode: tools/list advertises
    query_corpus, and a call runs the full 4-stage corpus query with the
    client's LLM via sampling."""
    env = dict(os.environ, TAT_JAX_PLATFORM="cpu")
    dbs = {}
    for name, text in (("alpha", "Bach wrote fugues"), ("beta", "budget notes")):
        db = str(tmp_path / f"{name}.db")
        dbs[name] = db
        build = await asyncio.create_subprocess_exec(
            sys.executable,
            "-c",
            (
                "import jax\n"
                "jax.config.update('jax_platforms','cpu')\n"
                "import asyncio\n"
                "from typeagent_tpu.knowpro.convsettings import ConversationSettings\n"
                "from typeagent_tpu.models.adapters import create_test_embedding_model\n"
                "from typeagent_tpu.podcasts.podcast import Podcast, PodcastMessage\n"
                "from typeagent_tpu.knowpro.universal_message import ConversationMessageMeta\n"
                "from typeagent_tpu.storage.utils import create_storage_provider\n"
                "async def go():\n"
                " s = ConversationSettings(model=create_test_embedding_model(8))\n"
                " s.semantic_ref_index_settings.auto_extract_knowledge = False\n"
                " s.storage_provider = await create_storage_provider("
                "s.message_text_index_settings, s.related_term_index_settings, "
                f"{db!r}, PodcastMessage)\n"
                f" p = await Podcast.create(s, name={name!r})\n"
                " await p.add_messages_with_indexing([PodcastMessage("
                f"[{text!r}], ConversationMessageMeta('S'), "
                "timestamp='2024-01-01T10:00:00Z')])\n"
                " await s.storage_provider.close()\n"
                "asyncio.run(go())"
            ),
            env=env,
        )
        assert await build.wait() == 0

    stage1 = json.dumps(
        {
            "searchExpressions": [
                {
                    "rewrittenQuery": "What about fugues?",
                    "filters": [{"searchTerms": ["fugues"]}],
                }
            ]
        }
    )
    answered = json.dumps({"type": "Answered", "answer": "Fugues by Bach."})
    no_answer = json.dumps({"type": "NoAnswer", "whyNoAnswer": "n/a"})

    proc = await asyncio.create_subprocess_exec(
        sys.executable,
        "-m",
        "typeagent_tpu.mcp.server",
        "--corpus",
        f"alpha={dbs['alpha']}",
        "--corpus",
        f"beta={dbs['beta']}",
        "--embedding-model",
        "test:8",
        stdin=asyncio.subprocess.PIPE,
        stdout=asyncio.subprocess.PIPE,
        env=env,
    )
    try:
        client = McpClient(proc, [stage1, answered, no_answer])
        await client.request(
            "initialize",
            {"protocolVersion": "2024-11-05", "capabilities": {}, "clientInfo": {}},
        )
        tools = await client.request("tools/list")
        names = [t["name"] for t in tools["result"]["tools"]]
        assert "query_corpus" in names

        result = await client.request(
            "tools/call",
            {
                "name": "query_corpus",
                "arguments": {"question": "What about fugues?"},
            },
            timeout=180,
        )
        content = result["result"]["content"][0]["text"]
        assert result["result"]["isError"] is False, content
        assert "Fugues by Bach." in content
        assert "[alpha]" in content and "[beta]" in content
    finally:
        proc.stdin.close()
        await asyncio.wait_for(proc.wait(), 10)
