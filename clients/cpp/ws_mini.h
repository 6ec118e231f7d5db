// Minimal RFC6455 websocket client helpers (shared by ws_client and
// mic_client_2pass). Raw POSIX sockets; masked client frames; ping/pong.
#ifndef ASR2PASS_WS_MINI_H_
#define ASR2PASS_WS_MINI_H_

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cctype>
#include <cstdint>
#include <cstring>
#include <random>
#include <sstream>
#include <string>
#include <vector>

namespace wsmini {


inline int dial(const std::string& host, const std::string& port) {
  addrinfo hints{};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  addrinfo* res = nullptr;
  if (getaddrinfo(host.c_str(), port.c_str(), &hints, &res) != 0) return -1;
  int fd = -1;
  for (addrinfo* p = res; p; p = p->ai_next) {
    fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  return fd;
}

inline bool send_all(int fd, const uint8_t* buf, size_t n) {
  while (n) {
    ssize_t k = send(fd, buf, n, 0);
    if (k <= 0) return false;
    buf += k;
    n -= k;
  }
  return true;
}

inline bool recv_all(int fd, uint8_t* buf, size_t n) {
  while (n) {
    ssize_t k = recv(fd, buf, n, 0);
    if (k <= 0) return false;
    buf += k;
    n -= k;
  }
  return true;
}

inline std::string base64(const uint8_t* data, size_t n) {
  static const char tbl[] =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  for (size_t i = 0; i < n; i += 3) {
    uint32_t v = data[i] << 16;
    if (i + 1 < n) v |= data[i + 1] << 8;
    if (i + 2 < n) v |= data[i + 2];
    out += tbl[(v >> 18) & 63];
    out += tbl[(v >> 12) & 63];
    out += (i + 1 < n) ? tbl[(v >> 6) & 63] : '=';
    out += (i + 2 < n) ? tbl[v & 63] : '=';
  }
  return out;
}

inline bool ws_handshake(int fd, const std::string& host) {
  std::mt19937 rng(std::random_device{}());
  uint8_t key[16];
  for (auto& b : key) b = (uint8_t)rng();
  std::ostringstream req;
  req << "GET / HTTP/1.1\r\nHost: " << host
      << "\r\nUpgrade: websocket\r\nConnection: Upgrade"
      << "\r\nSec-WebSocket-Key: " << base64(key, 16)
      << "\r\nSec-WebSocket-Version: 13\r\n\r\n";
  const std::string s = req.str();
  if (!send_all(fd, (const uint8_t*)s.data(), s.size())) return false;
  // read until end of HTTP headers
  std::string resp;
  uint8_t c;
  while (resp.find("\r\n\r\n") == std::string::npos) {
    if (!recv_all(fd, &c, 1)) return false;
    resp += (char)c;
    if (resp.size() > 65536) return false;
  }
  return resp.find(" 101 ") != std::string::npos;
}

inline bool ws_send(int fd, uint8_t opcode, const uint8_t* data, size_t n) {
  std::vector<uint8_t> frame;
  frame.push_back(0x80 | opcode);  // FIN + opcode
  if (n < 126) {
    frame.push_back(0x80 | (uint8_t)n);  // MASK bit + len
  } else if (n < 65536) {
    frame.push_back(0x80 | 126);
    frame.push_back((n >> 8) & 0xff);
    frame.push_back(n & 0xff);
  } else {
    frame.push_back(0x80 | 127);
    for (int i = 7; i >= 0; --i) frame.push_back((n >> (8 * i)) & 0xff);
  }
  uint8_t mask[4] = {0x12, 0x34, 0x56, 0x78};
  frame.insert(frame.end(), mask, mask + 4);
  const size_t off = frame.size();
  frame.resize(off + n);
  for (size_t i = 0; i < n; ++i) frame[off + i] = data[i] ^ mask[i % 4];
  return send_all(fd, frame.data(), frame.size());
}

// returns opcode, payload in out; false on close/error
inline bool ws_recv(int fd, uint8_t* opcode, std::string* out) {
  out->clear();
  bool fin = false;
  *opcode = 0;
  while (!fin) {
    uint8_t hdr[2];
    if (!recv_all(fd, hdr, 2)) return false;
    fin = hdr[0] & 0x80;
    uint8_t op = hdr[0] & 0x0f;
    if (op) *opcode = op;
    uint64_t len = hdr[1] & 0x7f;
    if (len == 126) {
      uint8_t ext[2];
      if (!recv_all(fd, ext, 2)) return false;
      len = (ext[0] << 8) | ext[1];
    } else if (len == 127) {
      uint8_t ext[8];
      if (!recv_all(fd, ext, 8)) return false;
      len = 0;
      for (int i = 0; i < 8; ++i) len = (len << 8) | ext[i];
    }
    std::vector<uint8_t> payload(len);
    if (len && !recv_all(fd, payload.data(), len)) return false;
    out->append((const char*)payload.data(), len);
    if (*opcode == 0x8) return false;  // close
    if (*opcode == 0x9) {              // ping -> pong
      ws_send(fd, 0xA, payload.data(), len);
      out->clear();
      fin = false;
      continue;
    }
  }
  return true;
}

inline std::string json_field(const std::string& j, const std::string& key) {
  const std::string pat = "\"" + key + "\"";
  size_t i = j.find(pat);
  if (i == std::string::npos) return "";
  i = j.find(':', i + pat.size());
  if (i == std::string::npos) return "";
  ++i;
  while (i < j.size() && isspace((unsigned char)j[i])) ++i;
  if (i >= j.size() || j[i] != '"') return "";
  std::string out;
  for (size_t k = i + 1; k < j.size(); ++k) {
    if (j[k] == '\\' && k + 1 < j.size()) {
      out += j[++k];
    } else if (j[k] == '"') {
      return out;
    } else {
      out += j[k];
    }
  }
  return out;
}


}  // namespace wsmini

#endif  // ASR2PASS_WS_MINI_H_
