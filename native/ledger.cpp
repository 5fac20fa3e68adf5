// Native sweep-ledger operations: atomic claim / mark under an flock.
//
// The reference coordinates 24-36 worker processes through a file-locked
// text ledger (run_ode.py:106-119,167-170; lib/utils.py:58-67).  This is
// the native fast path for that protocol: one flock-guarded read-scan-append
// (claim) or read-rewrite (mark) per call, interoperable with the Python
// filelock fallback because both lock the same "<path>.lock" file with
// flock(2) (filelock's Unix backend is fcntl.flock).
//
// Exposed via ctypes from fiude_tpu/utils/ledger.py; semantics are pinned
// against the pure-Python implementation by tests/test_native_ledger.py.

#include <cerrno>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/file.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// A line belongs to `key` iff it is the key itself or the key followed by
// status words (delimiter matching; the reference's substring test
// false-positives on prefix keys).
bool line_matches(const std::string& line, const std::string& key) {
  if (line.size() < key.size()) return false;
  if (line.compare(0, key.size(), key) != 0) return false;
  return line.size() == key.size() || line[key.size()] == ' ';
}

struct Locked {
  int lock_fd = -1;
  explicit Locked(const std::string& path) {
    const std::string lock_path = path + ".lock";
    lock_fd = ::open(lock_path.c_str(), O_RDWR | O_CREAT, 0644);
    if (lock_fd >= 0 && ::flock(lock_fd, LOCK_EX) != 0) {
      ::close(lock_fd);
      lock_fd = -1;
    }
  }
  ~Locked() {
    if (lock_fd >= 0) {
      ::flock(lock_fd, LOCK_UN);
      ::close(lock_fd);
    }
  }
  bool ok() const { return lock_fd >= 0; }
};

bool read_lines(const std::string& path, std::vector<std::string>* lines) {
  lines->clear();
  int fd = ::open(path.c_str(), O_RDONLY);
  if (fd < 0) return errno == ENOENT;  // absent file = empty ledger
  std::string data;
  char buf[1 << 16];
  ssize_t n;
  while ((n = ::read(fd, buf, sizeof(buf))) > 0) data.append(buf, n);
  ::close(fd);
  if (n < 0) return false;
  size_t pos = 0;
  while (pos < data.size()) {
    size_t nl = data.find('\n', pos);
    if (nl == std::string::npos) nl = data.size();
    lines->push_back(data.substr(pos, nl - pos));
    pos = nl + 1;
  }
  return true;
}

}  // namespace

extern "C" {

// 1 = claimed, 0 = already present, -1 = error.
int ledger_claim(const char* path_c, const char* key_c) {
  const std::string path(path_c), key(key_c);
  Locked guard(path);
  if (!guard.ok()) return -1;
  std::vector<std::string> lines;
  if (!read_lines(path, &lines)) return -1;
  for (const auto& line : lines)
    if (line_matches(line, key)) return 0;
  int fd = ::open(path.c_str(), O_WRONLY | O_CREAT | O_APPEND, 0644);
  if (fd < 0) return -1;
  const std::string rec = key + "\n";
  ssize_t w = ::write(fd, rec.data(), rec.size());
  ::close(fd);
  return w == static_cast<ssize_t>(rec.size()) ? 1 : -1;
}

// 1 = marked, 0 = key not found (file untouched), -1 = error.
int ledger_mark(const char* path_c, const char* key_c, const char* status_c) {
  const std::string path(path_c), key(key_c), status(status_c);
  Locked guard(path);
  if (!guard.ok()) return -1;
  std::vector<std::string> lines;
  if (!read_lines(path, &lines)) return -1;
  bool found = false;
  std::string out;
  for (auto& line : lines) {
    if (line_matches(line, key)) {
      line += " " + status;
      found = true;
    }
    out += line + "\n";
  }
  if (!found) return 0;
  int fd = ::open(path.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -1;
  ssize_t w = ::write(fd, out.data(), out.size());
  ::close(fd);
  return w == static_cast<ssize_t>(out.size()) ? 1 : -1;
}

}  // extern "C"
