/* Native RPC client for the qwen2-audio-tpu remote-offload server —
 * the C++ counterpart of ggml's RPC client backend
 * (/root/reference/ggml/src/ggml-rpc.cpp: socket helpers :100-250,
 * send_rpc_cmd framing :255-306). The server is
 * `python -m qwen2_audio_tpu.runtime.rpc` (runtime/rpc.py documents the
 * wire format: one command byte + u64-length JSON/array payload per
 * request, a status byte + u64-length payload per response).
 *
 * Build: part of native/CMakeLists.txt (target qa_rpc).
 * Usage: qa_rpc <host:port> <model.bin> <audio.wav>
 *   loads the model on the server, runs whisper_full on the wav, prints
 *   the 20-float encoder fingerprint and the transcribed segments.
 */

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int qa_wav_read(const char* path, float** out, long long* n, int* rate);
void qa_free(void* p);
}

namespace {

enum qa_rpc_cmd : uint8_t {
    QA_CMD_HELLO = 0,
    QA_CMD_LOAD_MODEL = 1,
    QA_CMD_FULL = 2,
    QA_CMD_GET_EMB_ENC = 4,
};
constexpr uint8_t QA_STATUS_OK = 0;
constexpr int QA_RPC_VERSION = 1;

bool send_all(int fd, const void* buf, size_t n) {
    const char* p = static_cast<const char*>(buf);
    while (n) {
        ssize_t w = ::send(fd, p, n, 0);
        if (w <= 0) return false;
        p += w;
        n -= static_cast<size_t>(w);
    }
    return true;
}

bool recv_all(int fd, void* buf, size_t n) {
    char* p = static_cast<char*>(buf);
    while (n) {
        ssize_t r = ::recv(fd, p, n, 0);
        if (r <= 0) return false;
        p += r;
        n -= static_cast<size_t>(r);
    }
    return true;
}

/* one frame: tag byte + u64 LE length + payload */
bool send_frame(int fd, uint8_t tag, const std::string& payload) {
    uint8_t head[9];
    head[0] = tag;
    uint64_t len = payload.size();
    std::memcpy(head + 1, &len, 8);
    return send_all(fd, head, 9) && send_all(fd, payload.data(), len);
}

bool recv_frame(int fd, uint8_t* tag, std::string* payload) {
    uint8_t head[9];
    if (!recv_all(fd, head, 9)) return false;
    *tag = head[0];
    uint64_t len;
    std::memcpy(&len, head + 1, 8);
    payload->resize(len);
    return len == 0 || recv_all(fd, payload->data(), len);
}

/* payload = u32 LE header-length + JSON header + raw array bytes
 * (runtime/rpc.py::_pack_json_arrays) */
std::string pack_payload(const std::string& json,
                         const std::vector<std::string>& arrays) {
    std::string out;
    uint32_t hl = static_cast<uint32_t>(json.size());
    out.append(reinterpret_cast<const char*>(&hl), 4);
    out += json;
    for (const auto& a : arrays) out += a;
    return out;
}

/* minimal JSON field extraction — the server controls the format, so a
 * scanner for  "key": <int> / "key": "<string>"  suffices */
bool json_int(const std::string& s, const char* key, long* out) {
    std::string pat = std::string("\"") + key + "\":";
    size_t p = s.find(pat);
    if (p == std::string::npos) return false;
    p += pat.size();
    while (p < s.size() && (s[p] == ' ')) ++p;
    *out = std::strtol(s.c_str() + p, nullptr, 10);
    return true;
}

bool json_str(const std::string& s, const char* key, std::string* out) {
    std::string pat = std::string("\"") + key + "\": \"";
    size_t p = s.find(pat);
    if (p == std::string::npos) {
        pat = std::string("\"") + key + "\":\"";
        p = s.find(pat);
        if (p == std::string::npos) return false;
    }
    p += pat.size();
    std::string r;
    while (p < s.size() && s[p] != '"') {
        if (s[p] == '\\' && p + 1 < s.size()) ++p;  // unescape \" \\ etc.
        r += s[p++];
    }
    *out = r;
    return true;
}

std::string array_manifest(const char* dtype, size_t n) {
    char buf[128];
    std::snprintf(buf, sizeof buf,
                  "{\"dtype\": \"%s\", \"shape\": [%zu]}", dtype, n);
    return buf;
}

int call(int fd, uint8_t cmd, const std::string& json,
         const std::vector<std::string>& arrays, std::string* resp) {
    if (!send_frame(fd, cmd, pack_payload(json, arrays))) return -1;
    uint8_t status;
    std::string payload;
    if (!recv_frame(fd, &status, &payload)) return -1;
    if (status != QA_STATUS_OK) {
        std::fprintf(stderr, "rpc error: %s\n", payload.c_str());
        return -2;
    }
    uint32_t hl;
    if (payload.size() < 4) return -1;
    std::memcpy(&hl, payload.data(), 4);
    *resp = payload.substr(4, hl);
    return 0;
}

}  // namespace

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr,
                     "usage: %s <host:port> <model.bin> <audio.wav>\n",
                     argv[0]);
        return 1;
    }
    std::string endpoint = argv[1];
    size_t colon = endpoint.rfind(':');
    std::string host = colon == std::string::npos ? "127.0.0.1"
                                                  : endpoint.substr(0, colon);
    int port = std::atoi(endpoint.c_str() + colon + 1);

    struct addrinfo hints = {}, *res = nullptr;
    hints.ai_family = AF_INET;
    hints.ai_socktype = SOCK_STREAM;
    if (getaddrinfo(host.c_str(), nullptr, &hints, &res) != 0 || !res) {
        std::fprintf(stderr, "cannot resolve %s\n", host.c_str());
        return 2;
    }
    reinterpret_cast<sockaddr_in*>(res->ai_addr)->sin_port =
        htons(static_cast<uint16_t>(port));
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0 || ::connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
        std::fprintf(stderr, "cannot connect to %s:%d\n", host.c_str(), port);
        freeaddrinfo(res);
        return 2;
    }
    freeaddrinfo(res);

    std::string resp;
    char hello[128];
    std::snprintf(hello, sizeof hello,
                  "{\"meta\": {\"magic\": \"QARP\", \"version\": %d}, "
                  "\"arrays\": []}", QA_RPC_VERSION);
    if (call(fd, QA_CMD_HELLO, hello, {}, &resp) != 0) return 3;
    std::string backend;
    json_str(resp, "backend", &backend);
    std::fprintf(stderr, "connected; server backend: %s\n", backend.c_str());

    /* load model bytes */
    FILE* f = std::fopen(argv[2], "rb");
    if (!f) {
        std::fprintf(stderr, "cannot open %s\n", argv[2]);
        return 4;
    }
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string model(static_cast<size_t>(sz), 0);
    if (std::fread(model.data(), 1, sz, f) != static_cast<size_t>(sz)) {
        std::fclose(f);
        return 4;
    }
    std::fclose(f);
    std::string json = "{\"meta\": {\"cparams\": {}}, \"arrays\": ["
                       + array_manifest("uint8", model.size()) + "]}";
    if (call(fd, QA_CMD_LOAD_MODEL, json, {model}, &resp) != 0) return 5;
    long ctx_id = -1, n_vocab = 0;
    json_int(resp, "ctx_id", &ctx_id);
    json_int(resp, "n_vocab", &n_vocab);
    std::fprintf(stderr, "model loaded: ctx_id=%ld n_vocab=%ld\n",
                 ctx_id, n_vocab);

    /* load wav, run full */
    float* pcm = nullptr;
    long long n = 0;
    int rate = 0;
    if (qa_wav_read(argv[3], &pcm, &n, &rate) != 0 || rate != 16000) {
        std::fprintf(stderr, "cannot read 16 kHz wav %s\n", argv[3]);
        return 6;
    }
    std::string pcm_bytes(reinterpret_cast<const char*>(pcm),
                          static_cast<size_t>(n) * sizeof(float));
    qa_free(pcm);
    char meta[160];
    std::snprintf(meta, sizeof meta,
                  "{\"meta\": {\"ctx_id\": %ld, \"fparams\": "
                  "{\"print_progress\": false}}, \"arrays\": [", ctx_id);
    json = std::string(meta)
           + array_manifest("float32", static_cast<size_t>(n)) + "]}";
    if (call(fd, QA_CMD_FULL, json, {pcm_bytes}, &resp) != 0) return 7;
    long rc = -1;
    json_int(resp, "rc", &rc);
    std::fprintf(stderr, "whisper_full rc=%ld\n", rc);

    /* fingerprint (≙ whisper_print_emb_enc) + segments */
    char q[96];
    std::snprintf(q, sizeof q,
                  "{\"meta\": {\"ctx_id\": %ld}, \"arrays\": []}", ctx_id);
    if (call(fd, QA_CMD_GET_EMB_ENC, q, {}, &resp) != 0) return 8;
    std::string fp;
    json_str(resp, "fingerprint", &fp);
    std::printf("%s\n", fp.c_str());
    return rc == 0 ? 0 : 9;
}
