"""get_keys: Key Vault <-> .env sync over mocked REST.

Covers the reference tool's observable behaviors (tools/get_keys.py in the
reference repo): pull updates only configured keys, preserves comments,
deletes obsolete keys, persists vault names; push writes only changed
secrets and maps underscores to dashes; dashed .env keys are rejected.
"""

import argparse
import json

import httpx
import pytest

from typeagent_tpu.tools import get_keys as gk


class FakeVault:
    """In-memory vault behind an httpx.MockTransport."""

    def __init__(self, name: str, secrets: dict[str, str]):
        self.name = name
        self.secrets = dict(secrets)
        self.writes: list[str] = []

    def handler(self, request: httpx.Request) -> httpx.Response:
        assert request.headers["Authorization"] == "Bearer tok"
        assert request.url.host == f"{self.name}.vault.azure.net"
        parts = request.url.path.strip("/").split("/")
        if parts == ["secrets"]:
            value = [
                {"id": f"https://{self.name}.vault.azure.net/secrets/{n}"}
                for n in self.secrets
            ]
            return httpx.Response(200, json={"value": value, "nextLink": None})
        assert parts[0] == "secrets" and len(parts) == 2
        name = parts[1]
        if request.method == "PUT":
            self.secrets[name] = json.loads(request.content)["value"]
            self.writes.append(name)
            return httpx.Response(200, json={"value": self.secrets[name]})
        if name not in self.secrets:
            return httpx.Response(404, json={"error": {"code": "SecretNotFound"}})
        return httpx.Response(200, json={"value": self.secrets[name]})


def make_client(vault: FakeVault) -> gk.KeyVaultClient:
    return gk.KeyVaultClient(
        token="tok", client=httpx.Client(transport=httpx.MockTransport(vault.handler))
    )


def write_config(tmp_path, dotenv_name=".env", shared=("OPENAI_API_KEY",),
                 delete=(), vault="teamvault"):
    cfg = tmp_path / "get_keys.config.json"
    cfg.write_text(json.dumps({
        "defaultDotEnvPath": dotenv_name,
        "env": {"shared": list(shared), "private": [], "delete": list(delete)},
        "vault": {"shared": vault},
    }))
    return cfg


def test_pull_updates_configured_keys_and_preserves_comments(tmp_path):
    cfg = write_config(tmp_path, shared=("OPENAI_API_KEY", "GEMINI_API_KEY"),
                       delete=("OLD_KEY",))
    dotenv = tmp_path / ".env"
    dotenv.write_text(
        "# provider keys\nOPENAI_API_KEY=stale\nOLD_KEY=gone\nUNMANAGED=keep\n"
    )
    vault = FakeVault("teamvault", {
        "OPENAI-API-KEY": "sk-new",
        "GEMINI-API-KEY": "gm-1",
        "IRRELEVANT-SECRET": "nope",
    })
    args = argparse.Namespace(
        vault=None, private=None, dotenv=None)
    changed = gk.pull(make_client(vault), gk.Config(cfg), args)
    text = dotenv.read_text()
    assert changed == 4  # two values + delete + TYPEAGENT_SHAREDVAULT
    assert text.startswith("# provider keys\n")  # comment preserved, in place
    assert "OPENAI_API_KEY=sk-new" in text
    assert "GEMINI_API_KEY=gm-1" in text
    assert "UNMANAGED=keep" in text  # unmanaged keys untouched
    assert "IRRELEVANT_SECRET" not in text  # only configured keys pulled
    assert "OLD_KEY" not in text  # delete list applied
    assert "TYPEAGENT_SHAREDVAULT=teamvault" in text  # vault name persisted


def test_pull_is_idempotent(tmp_path):
    cfg = write_config(tmp_path)
    vault = FakeVault("teamvault", {"OPENAI-API-KEY": "sk-1"})
    args = argparse.Namespace(
        vault=None, private=None, dotenv=None)
    assert gk.pull(make_client(vault), gk.Config(cfg), args) == 2
    assert gk.pull(make_client(vault), gk.Config(cfg), args) == 0


def test_pull_empty_vault_errors(tmp_path):
    cfg = write_config(tmp_path)
    args = argparse.Namespace(
        vault=None, private=None, dotenv=None)
    with pytest.raises(SystemExit, match="No secrets found"):
        gk.pull(make_client(FakeVault("teamvault", {})), gk.Config(cfg), args)


def test_push_writes_only_changed_secrets(tmp_path):
    cfg = write_config(tmp_path, shared=("OPENAI_API_KEY", "GEMINI_API_KEY"))
    (tmp_path / ".env").write_text(
        "OPENAI_API_KEY=sk-same\nGEMINI_API_KEY=gm-new\nUNMANAGED=x\n"
    )
    vault = FakeVault("teamvault", {"OPENAI-API-KEY": "sk-same",
                                    "GEMINI-API-KEY": "gm-old"})
    args = argparse.Namespace(
        vault=None, private=None, dotenv=None, yes=True)
    written = gk.push(make_client(vault), gk.Config(cfg), args)
    assert written == 1
    assert vault.writes == ["GEMINI-API-KEY"]  # underscore->dash mapping
    assert vault.secrets["GEMINI-API-KEY"] == "gm-new"
    assert "UNMANAGED" not in {gk.to_env_key(n) for n in vault.secrets}


def test_dashed_dotenv_key_rejected(tmp_path):
    cfg = write_config(tmp_path)
    (tmp_path / ".env").write_text("BAD-KEY=x\n")
    args = argparse.Namespace(
        vault=None, private=None, dotenv=None)
    with pytest.raises(SystemExit, match="dash"):
        gk.pull(make_client(FakeVault("teamvault", {"A-B": "v"})),
                gk.Config(cfg), args)


def test_vault_resolution_precedence(tmp_path):
    cfg_file = write_config(tmp_path, vault="from-config")
    (tmp_path / ".env").write_text("TYPEAGENT_SHAREDVAULT=from-env\n")
    cfg = gk.Config(cfg_file)
    env = gk.dotenv_values(gk.read_dotenv_lines(tmp_path / ".env"))
    ns = argparse.Namespace(vault=None, private=None)
    assert gk.resolve_vaults(ns, cfg, env)["shared"] == "from-env"
    ns_flag = argparse.Namespace(
        vault="from-flag", private=None)
    assert gk.resolve_vaults(ns_flag, cfg, env)["shared"] == "from-flag"
    assert gk.resolve_vaults(ns, cfg, {})["shared"] == "from-config"


def test_forbidden_maps_to_actionable_error(tmp_path):
    def deny(request: httpx.Request) -> httpx.Response:
        return httpx.Response(403, json={"error": {"code": "Forbidden"}})

    client = gk.KeyVaultClient(
        token="tok", client=httpx.Client(transport=httpx.MockTransport(deny)))
    with pytest.raises(SystemExit, match="Secrets User"):
        client.list_secret_names("teamvault")


def test_pull_rewrites_duplicate_keys(tmp_path):
    """A later duplicate line wins on reload — every occurrence must update."""
    cfg = write_config(tmp_path)
    dotenv = tmp_path / ".env"
    dotenv.write_text("OPENAI_API_KEY=old1\nOTHER=x\nOPENAI_API_KEY=old2\n")
    vault = FakeVault("teamvault", {"OPENAI-API-KEY": "sk-new"})
    args = argparse.Namespace(vault=None, private=None, dotenv=None)
    gk.pull(make_client(vault), gk.Config(cfg), args)
    values = gk.dotenv_values(gk.read_dotenv_lines(dotenv))
    assert values["OPENAI_API_KEY"] == "sk-new"
    assert "old2" not in dotenv.read_text()


def test_push_reads_only_configured_secrets(tmp_path):
    cfg = write_config(tmp_path, shared=("OPENAI_API_KEY",))
    (tmp_path / ".env").write_text("OPENAI_API_KEY=sk-1\n")
    vault = FakeVault("teamvault", {"OPENAI-API-KEY": "sk-0",
                                    "UNRELATED-SECRET": "other"})
    reads: list[str] = []
    orig = vault.handler

    def counting(request: httpx.Request) -> httpx.Response:
        parts = request.url.path.strip("/").split("/")
        if len(parts) == 2 and request.method == "GET":
            reads.append(parts[1])
        return orig(request)

    client = gk.KeyVaultClient(
        token="tok", client=httpx.Client(transport=httpx.MockTransport(counting)))
    args = argparse.Namespace(vault=None, private=None, dotenv=None, yes=True)
    assert gk.push(client, gk.Config(cfg), args) == 1
    assert reads == ["OPENAI-API-KEY"]  # UNRELATED-SECRET never fetched
