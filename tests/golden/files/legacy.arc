filedesc://test.arc 127.0.0.1 20000101000000 text/plain 76
1 0 InternetArchive
URL IP-address Archive-date Content-type Archive-length

http://example.com/arc 127.0.0.1 20000101000000 text/plain 54
HTTP/1.0 200 OK
Content-Type: text/plain

hello arc
