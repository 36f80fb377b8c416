package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Mail

class MailSpec extends AnyFunSuite {

  test("plain message: header unfolding, 7bit body") {
    val m = Mail.parseEml(Mail.synthEml(3)).get // id%3 == 0
    assert(m.from == "user3@example.com")
    assert(m.to == "list3@example.org, second@example.org") // unfolded
    assert(m.subject == "Plain note 3")
    assert(m.n_parts == 1 && m.n_attachments == 0)
    assert(m.text == "Hello body 3\nBye 3")
  }

  test("nested multipart: QP soft break, base64 html, attachment") {
    val m = Mail.parseEml(Mail.synthEml(7)).get // id%3 == 1
    assert(m.subject == "Réport 7") // RFC 2047 B
    assert(m.n_parts == 3 && m.n_attachments == 1)
    assert(m.text == "Café one 7 two\nPara 7\nEnd 7")
  }

  test("alternative: Q-encoded subject with adjacent-word joining") {
    val m = Mail.parseEml(Mail.synthEml(5)).get // id%3 == 2
    assert(m.subject == "Résumé 5 final") // _=space, inter-word WS gone
    assert(m.n_parts == 2 && m.n_attachments == 0)
    assert(m.text == "Alt body 5\nHtml alt 5")
  }

  test("encoded-words: charsets, bad base64 stays literal") {
    assert(Mail.decodeEncodedWords("=?ISO-8859-1?Q?caf=E9?=") == "café")
    assert(Mail.decodeEncodedWords("plain text") == "plain text")
    // undecodable word survives literally, never throws
    assert(Mail.decodeEncodedWords("=?UTF-8?B?!!!not-b64!!!?=")
      == "=?UTF-8?B?!!!not-b64!!!?=")
    // mixed literal + encoded
    assert(Mail.decodeEncodedWords("Re: =?UTF-8?Q?ok_then?=")
      == "Re: ok then")
  }

  test("mbox: envelope splitting, >From unquote, From: is not From ") {
    val msgs = Mail.mboxMessages(Mail.synthMbox(3)).get
    assert(msgs.length == 3)
    // message 0 is shape id%3==0 with the >From splice unquoted
    assert(msgs(0).text == "From the start\nHello body 3\nBye 3")
    assert(msgs(1).subject == "Réport 4")
    assert(msgs(2).subject == "Résumé 5 final")
    // not-an-mbox inputs
    assert(Mail.mboxMessages("From: a@b\n\nbody").isEmpty)
    assert(Mail.mboxMessages(null).isEmpty)
    // an unparseable message drops, the archive survives
    val partial = "From x@y Thu Jan  1 00:00:00 2024\njunk no headers\n" +
      "From x@y Thu Jan  1 00:01:00 2024\n" + Mail.synthEml(6)
    assert(Mail.mboxMessages(partial).get.length == 1)
    // double-quoted: >>From loses exactly one '>'
    val deep = "From x@y t\nFrom: a@b\n\n>>From depth\n"
    assert(Mail.mboxMessages(deep).get.head.text == ">From depth")
  }

  test("degrades: missing boundary, unknown CTE, junk input") {
    // multipart with no boundary param: one opaque (attachment) part
    val noB = "From: a@b\nContent-Type: multipart/mixed\n\nbody"
    val m = Mail.parseEml(noB).get
    assert(m.n_parts == 1 && m.n_attachments == 1 && m.text.isEmpty)
    // unknown transfer encoding: part drops, message survives
    val badCte = "From: a@b\nContent-Transfer-Encoding: uuencode\n\nxx"
    assert(Mail.parseEml(badCte).get.text.isEmpty)
    // structurally header-less text is not a message
    assert(Mail.parseEml("just some text\nwithout headers").isEmpty)
    assert(Mail.parseEml("").isEmpty)
    assert(Mail.parseEml(null).isEmpty)
  }
}
